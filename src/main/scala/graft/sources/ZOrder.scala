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
  * Scale shape: one 4-scalar aggregate for the dimension bounds (index
  * metadata — the same driver-hop class as an IVF probe list), then ONE
  * range shuffle of the data on the z-value. The z-value itself is a
  * fixed tree of codegen'd bitwise builtins (mask-shift bit spread) — no
  * UDF, no interpreted expression on the hot path. Linear 16-bit
  * quantization keeps the demo exact and engine-reproducible; production
  * systems quantize on SAMPLED RANGE BOUNDARIES instead so heavy skew
  * cannot collapse the curve into few cells — the swap is local to
  * [[quantize]].
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

  /** Linear quantization of `c` into [0, 65535] over [min, max]. NULL
    * ordinates quantize to 0 (they sort to the curve's origin corner —
    * a single cell, so NULL-heavy data degrades pruning for the NULL
    * cell only, never for the rest of the curve).
    */
  def quantize(c: Column, min: Double, max: Double): Column =
    if (max - min <= 0) lit(0L)
    else least(greatest(
      floor((coalesce(c.cast("double"), lit(min)) - lit(min)) /
        lit(max - min) * lit(65535.0)).cast("long"),
      lit(0L)), lit(65535L))

  /** Rewrite the parquet dataset at `inPath` clustered on the Morton
    * curve of (`colA`, `colB`) into `numFiles` range partitions at
    * `outPath`, and return the rewritten dataset. Content-identical to
    * the input — only the file layout changes (the curve column is
    * dropped before the write; the per-file min/max of the REAL columns
    * is what carries the clustering).
    */
  def cluster(spark: SparkSession, inPath: String, outPath: String,
      colA: String, colB: String, numFiles: Int): DataFrame = {
    require(numFiles >= 1, "numFiles must be >= 1")
    val df = spark.read.parquet(inPath)
    val r = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    require(!r.anyNull, s"cannot z-order on all-NULL column ($colA, $colB)")
    val z = zValue(
      quantize(col(colA), r.getDouble(0), r.getDouble(1)),
      quantize(col(colB), r.getDouble(2), r.getDouble(3)))
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(outPath)
    spark.read.parquet(outPath)
  }
}
