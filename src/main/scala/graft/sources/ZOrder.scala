package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the multi-dimensional companion to
  * [[Sinks.compactParquet]]'s file-count maintenance. A table sorted on
  * ONE column prunes row groups on that column only; interleaving the
  * bits of two dimensions and range-partitioning on the resulting curve
  * gives every file a tight min/max envelope in BOTH dimensions, so
  * parquet row-group statistics (and any file-index layer above them)
  * skip on either predicate. This is the layout move the reference's lake
  * would get from a table format's `OPTIMIZE ZORDER BY`; here it is pure
  * dataflow over plain parquet.
  *
  * Scale shape: ONE sampling pass for the per-dimension quantile
  * boundaries (`approxQuantile`, both columns in a single job — the same
  * driver-hop class as an IVF probe list), then ONE range shuffle of the
  * data on the z-value. Quantization is RANK-BASED on the sampled
  * boundaries: each dimension is cut into cells of ~equal row mass, so a
  * skewed distribution (most of `events.value` piles into the low tenth
  * of its span) still spreads across the full curve — linear [min,max]
  * scaling would collapse it into a few cells and every file's envelope
  * would span the hot range. Cell lookup is a balanced comparison tree
  * of codegen'd `when`/`otherwise` nodes (O(log cells) compares per
  * row); the bit interleave is a fixed tree of codegen'd bitwise
  * builtins (mask-shift bit spread) — no UDF, no interpreted expression
  * on the hot path.
  */
object ZOrder {

  /** Spread the low 16 bits of `x` to the even bit positions (0,2,4,…)
    * of a 32-bit value — the classic mask-shift interleave, expressed in
    * codegen'd bitwise builtins.
    */
  private def spread16(x: Column): Column = {
    val m0 = x.bitwiseAND(lit(0xFFFFL))
    val m1 = m0.bitwiseOR(shiftleft(m0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val m2 = m1.bitwiseOR(shiftleft(m1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val m3 = m2.bitwiseOR(shiftleft(m2, 2)).bitwiseAND(lit(0x33333333L))
    m3.bitwiseOR(shiftleft(m3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit quantized dimensions. */
  def zValue(qa: Column, qb: Column): Column =
    spread16(qa).bitwiseOR(shiftleft(spread16(qb), 1))

  /** Per-dimension quantization resolution for an n-way interleave:
    * 16 bits for 1-2 dims (the [[zValue]] resolution), then the widest
    * equal split that keeps the full code in a positive signed long.
    */
  def bitsFor(n: Int): Int = {
    require(n >= 1, s"need at least one dimension, got $n")
    math.min(16, 62 / n)
  }

  /** N-dimensional Morton code: bit i of dimension d lands at position
    * i*n + d, so equal-significance bits of all dimensions interleave —
    * the 2-dim [[zValue]] generalized. Each dimension must already be
    * quantized to [0, 2^bits). A fixed tree of n*bits codegen'd bitwise
    * builtins (shift/and/or) — no UDF; for (n=2, bits=16) it delegates
    * to the mask-shift [[zValue]] fast path, bit-identically.
    */
  def zValueN(qs: Seq[Column], bits: Int): Column = {
    val n = qs.size
    require(n >= 1, "zValueN needs at least one dimension")
    require(bits >= 1 && n * bits <= 62,
      s"interleave overflows a signed long: $n dims x $bits bits")
    if (n == 1) qs.head
    else if (n == 2 && bits == 16) zValue(qs(0), qs(1))
    else {
      val terms = for {
        (q, d) <- qs.zipWithIndex
        i <- 0 until bits
      } yield shiftleft(shiftright(q, i).bitwiseAND(lit(1L)), i * n + d)
      terms.reduce(_.bitwiseOR(_))
    }
  }

  /** Order-preserving double surrogate of any orderable column — what
    * lets rank/linear quantization (and therefore z-ordering) run over
    * NON-numeric dimensions. Monotone by construction per type:
    * numerics cast; date/timestamp take their epoch ordinal; booleans
    * 0/1; strings and binaries take the first 6.5 bytes as a base-16
    * integer (13 hex digits = 52 bits, exact in a double), padded with
    * the lowest digit so prefixes stay below their extensions. Values
    * sharing a 6.5-byte prefix collapse into one cell — a resolution
    * trade, never an ordering error (rounding and truncation are both
    * monotone).
    */
  def ordinate(c: Column, dt: org.apache.spark.sql.types.DataType)
      : Column = {
    import org.apache.spark.sql.types._
    dt match {
      case _: NumericType => c.cast("double")
      case BooleanType => c.cast("int").cast("double")
      case DateType => unix_date(c).cast("double")
      case TimestampType => unix_micros(c).cast("double")
      case _: TimestampNTZType =>
        unix_micros(c.cast(TimestampType)).cast("double")
      case StringType => hexPrefixOrdinate(hex(encode(c, "UTF-8")))
      case BinaryType => hexPrefixOrdinate(hex(c))
      case other => throw new IllegalArgumentException(
        s"cannot z-order on a column of type ${other.simpleString}")
    }
  }

  private def hexPrefixOrdinate(hexStr: Column): Column =
    conv(rpad(substring(hexStr, 1, 13), 13, "0"), 16, 10).cast("double")

  /** Linear quantization of `c` into [0, 65535] over [min, max]. Exact
    * and engine-reproducible when the bounds are known a priori; use
    * [[quantizeByBounds]] for data-driven layouts, where skew would
    * collapse the linear scale. NULL ordinates quantize to 0 (they sort
    * to the curve's origin corner — a single cell, so NULL-heavy data
    * degrades pruning for the NULL cell only, never for the rest of the
    * curve).
    */
  def quantize(c: Column, min: Double, max: Double): Column =
    quantizeTo(c, min, max, 65535L)

  /** [[quantize]] at an explicit resolution: linear map onto
    * [0, maxCell] — the per-dimension range an n-way interleave's
    * [[bitsFor]] budget allows (maxCell = 2^bits - 1).
    */
  def quantizeTo(c: Column, min: Double, max: Double,
      maxCell: Long): Column =
    if (max - min <= 0) lit(0L)
    else least(greatest(
      floor((coalesce(c.cast("double"), lit(min)) - lit(min)) /
        lit(max - min) * lit(maxCell.toDouble)).cast("long"),
      lit(0L)), lit(maxCell))

  /** Sampled per-dimension cell boundaries: the (1/cells … (cells-1)/
    * cells) quantiles of each column, deduplicated — heavy point masses
    * produce repeated quantiles, and each distinct value is one cell
    * edge. One job for all columns. All-NULL columns (no sampleable
    * mass) are rejected loudly rather than silently mapped to one cell.
    */
  def rankBounds(df: DataFrame, cols: Seq[String], cells: Int = 256)
      : Seq[Array[Double]] = {
    require(cells >= 2 && cells <= 65536, s"cells out of range: $cells")
    val probs = (1 until cells).map(_.toDouble / cells).toArray
    val qs = df.stat.approxQuantile(cols.toArray, probs, 1.0 / (4 * cells))
    cols.zip(qs).map { case (name, b) =>
      require(b.nonEmpty, s"cannot z-order on all-NULL column $name")
      b.distinct.sorted
    }
  }

  /** Rank quantization of `c` against sorted `bounds`: the cell index is
    * the number of boundaries <= value, found by a BALANCED comparison
    * tree (O(log bounds) codegen'd compares per row, never a linear
    * scan), then scaled onto [0, 65535] so both dimensions carry equal
    * bit significance in the interleave no matter how many distinct
    * boundaries survived deduplication. NULLs take cell 0 (the curve's
    * origin corner), matching [[quantize]]'s NULL policy.
    */
  def quantizeByBounds(c: Column, bounds: Array[Double]): Column = {
    require(bounds.nonEmpty, "quantizeByBounds needs at least one boundary")
    val v = coalesce(c.cast("double"), lit(Double.NegativeInfinity))
    def search(lo: Int, hi: Int): Column =
      if (lo == hi) lit(lo.toLong)
      else {
        val mid = (lo + hi) / 2
        when(v >= lit(bounds(mid)), search(mid + 1, hi))
          .otherwise(search(lo, mid))
      }
    val cells = bounds.length
    (search(0, cells) * lit(65535L) / lit(cells.toLong)).cast("long")
  }

  /** Rewrite the parquet dataset at `inPath` clustered on the Morton
    * curve of (`colA`, `colB`) into `numFiles` range partitions at
    * `outPath`, and return the rewritten dataset. Content-identical to
    * the input — only the file layout changes (the curve column is
    * dropped before the write; the per-file min/max of the REAL columns
    * is what carries the clustering). `cells` bounds the per-dimension
    * quantization resolution; the default (256 ~equal-mass cells) is
    * plenty for thousands of output files, since a file's envelope is
    * set by the curve prefix, not the cell count.
    */
  def cluster(spark: SparkSession, inPath: String, outPath: String,
      colA: String, colB: String, numFiles: Int,
      cells: Int = 256): DataFrame = {
    require(numFiles >= 1, "numFiles must be >= 1")
    val df = spark.read.parquet(inPath)
    val Seq(boundsA, boundsB) = rankBounds(df, Seq(colA, colB), cells)
    val z = zValue(
      quantizeByBounds(col(colA), boundsA),
      quantizeByBounds(col(colB), boundsB))
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(outPath)
    spark.read.parquet(outPath)
  }
}
