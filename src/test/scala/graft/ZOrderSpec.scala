package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.{Tables, ZOrder}

class ZOrderSpec extends AnyFunSuite with SparkTestBase {

  test("z-value interleaves quantized bits (known vectors)") {
    import spark.implicits._
    val df = Seq((0xFFFFL, 0L), (0L, 0xFFFFL), (3L, 3L), (0L, 0L))
      .toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b")).as("z"))
    val zs = df.collect().map(_.getLong(0)).toSeq
    // a fills even bit positions, b odd; 3,3 -> low nibble 1111
    assert(zs == Seq(0x55555555L, 0xAAAAAAAAL, 15L, 0L), zs.toString)
  }

  test("z-order layout prunes files on the second dimension; " +
    "single-column sort does not") {
    val tmp = java.nio.file.Files
      .createTempDirectory("zorder_test").toFile.getAbsolutePath
    val src = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "value")

    // the contrast layout: range-sorted on user_id alone — perfect
    // pruning on user_id, none on value
    src.repartitionByRange(16, col("user_id"))
      .sortWithinPartitions("user_id")
      .write.parquet(s"$tmp/linear")
    src.write.parquet(s"$tmp/src")
    ZOrder.cluster(spark, s"$tmp/src", s"$tmp/zorder",
      "user_id", "value", numFiles = 16)

    // per-file envelopes from the data itself — exactly the min/max a
    // parquet footer (or a file-index layer) stores for each file
    def envelopes(path: String): Seq[(Double, Double)] =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
        .collect().map(r => (r.getDouble(1), r.getDouble(2))).toSeq

    // a value-only box: ~10% of the range, orthogonal to user_id
    val (qlo, qhi) = (0.0, 30.0)
    def overlapping(env: Seq[(Double, Double)]): Int =
      env.count { case (lo, hi) => hi >= qlo && lo <= qhi }

    val linEnv = envelopes(s"$tmp/linear")
    val zEnv = envelopes(s"$tmp/zorder")
    assert(linEnv.size >= 10, s"setup: only ${linEnv.size} linear files")
    assert(zEnv.size >= 10, s"setup: only ${zEnv.size} z-ordered files")
    val (linHit, zHit) = (overlapping(linEnv), overlapping(zEnv))
    // every user_id-sorted file spans the full value range; the curve
    // confines the box to the files of its value cells
    assert(linHit >= linEnv.size - 1,
      s"expected user_id sort to overlap ~all files, hit $linHit/${linEnv.size}")
    assert(zHit * 2 <= zEnv.size,
      s"z-order should skip at least half the files: $zHit/${zEnv.size}")
    assert(zHit < linHit, s"z-order ($zHit) must beat linear ($linHit)")

    // layout change only: content identical to the source
    val z = spark.read.parquet(s"$tmp/zorder")
    assert(z.count() == src.count())
    assert(z.agg(sum(col("event_id"))).head.getLong(0) ==
      src.agg(sum(col("event_id"))).head.getLong(0))
    assert(z.columns.sorted.toSeq == src.columns.sorted.toSeq,
      "curve column must not leak into the output schema")
  }

  test("rank quantization equalizes cell mass under skew; NULL -> origin") {
    import spark.implicits._
    // 90% of the mass in [0, 10), a thin tail to 1000 — the shape that
    // collapses linear quantization into the bottom cells
    val skewed = ((0 until 900).map(_ / 90.0) ++
      (0 until 100).map(i => 10.0 + i * 9.9)).map(Option(_))
    val df = (skewed :+ None).toDF("x")
    val bounds = ZOrder.rankBounds(df, Seq("x"), cells = 16).head
    assert(bounds.length >= 8, s"skew ate the boundaries: ${bounds.toSeq}")
    // boundaries are rank-based: most cut inside the hot [0,10) range
    assert(bounds.count(_ < 10.0) >= bounds.length / 2, bounds.toSeq.toString)
    val q = df.select(ZOrder.quantizeByBounds(col("x"), bounds).as("q"))
    // cells carry ~equal mass: no quantized value owns >20% of rows
    val maxShare = q.groupBy("q").count()
      .agg(max(col("count"))).head.getLong(0)
    assert(maxShare <= skewed.size / 5, s"a cell owns $maxShare rows")
    val nullQ = Seq(Option.empty[Double]).toDF("x")
      .select(ZOrder.quantizeByBounds(col("x"), bounds))
      .head.getLong(0)
    assert(nullQ == 0L, "NULL must map to the origin cell")
    // monotone: quantized order preserves value order
    val pairs = df.na.drop
      .select(col("x"), ZOrder.quantizeByBounds(col("x"), bounds).as("q"))
      .orderBy("x").collect().map(r => r.getLong(1))
    assert(pairs.sameElements(pairs.sorted), "rank cells must be monotone")
  }

  test("quantize clamps, handles NULL and degenerate spans") {
    import spark.implicits._
    val df = Seq(Some(-5.0), Some(0.0), Some(50.0), Some(100.0),
      Some(200.0), None).toDF("x")
    val q = df.select(ZOrder.quantize(col("x"), 0.0, 100.0).as("q"))
      .collect().map(_.getLong(0)).toSeq
    assert(q(0) == 0L && q(1) == 0L && q(3) == 65535L, q.toString)
    assert(q(2) == math.floor(0.5 * 65535.0).toLong, q.toString)
    assert(q(4) == 65535L, "above-max must clamp")
    assert(q(5) == 0L, "NULL quantizes to the origin cell")
    val degenerate = df.select(ZOrder.quantize(col("x"), 7.0, 7.0).as("q"))
      .collect().map(_.getLong(0)).toSeq
    assert(degenerate.forall(_ == 0L), "zero span collapses to one cell")
  }

  test("zValueN: known vectors, 2-dim fast-path identity, overflow " +
      "guard") {
    import spark.implicits._
    // n=3, bits=2: dim d's bit i lands at 3i+d
    val df3 = Seq((1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L),
      (2L, 0L, 0L), (3L, 3L, 3L)).toDF("a", "b", "c")
    val z3 = df3.select(ZOrder.zValueN(
      Seq(col("a"), col("b"), col("c")), 2).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(z3 == Seq(1L, 2L, 4L, 8L, 63L), z3.toString)
    // the (n=2, bits=16) general form IS the spread16 fast path
    val df2 = Seq((0xFFFFL, 0L), (0L, 0xFFFFL), (3L, 3L), (12345L, 54321L))
      .toDF("a", "b")
    val both = df2.select(
      ZOrder.zValueN(Seq(col("a"), col("b")), 16).as("zn"),
      ZOrder.zValue(col("a"), col("b")).as("z2"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(both.forall { case (zn, z2) => zn == z2 }, both.toSeq.toString)
    // one dim passes through; a 63-bit budget refuses
    val z1 = df2.select(ZOrder.zValueN(Seq(col("a")), 16).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(z1 == Seq(0xFFFFL, 0L, 3L, 12345L))
    intercept[IllegalArgumentException] {
      ZOrder.zValueN(Seq(col("a"), col("b"), col("a"), col("b")), 16)
    }
    assert(ZOrder.bitsFor(2) == 16 && ZOrder.bitsFor(3) == 16 &&
      ZOrder.bitsFor(4) == 15 && ZOrder.bitsFor(8) == 7)
  }

  test("ordinate is order-preserving per type; unsupported types " +
      "refuse") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // strings: lexicographic byte order carries into the surrogate,
    // incl. prefixes vs extensions and the >6.5-byte collapse
    val sdf = Seq("", "a", "apple", "applesauce", "banana", "zz")
      .toDF("s")
    val so = sdf.select(ZOrder.ordinate(col("s"), StringType).as("o"))
      .collect().map(_.getDouble(0)).toSeq
    assert(so.sameElements(so.sorted), so.toString)
    assert(so.distinct.size >= 5, "distinct short strings must separate")
    // timestamps and dates: epoch ordinals
    val t = Seq("2020-01-01 00:00:00", "2020-01-01 00:00:01",
      "2024-06-30 12:00:00").map(java.sql.Timestamp.valueOf)
    val to = t.toDF("t")
      .select(ZOrder.ordinate(col("t"), TimestampType).as("o"))
      .collect().map(_.getDouble(0)).toSeq
    assert(to.sameElements(to.sorted) && to.distinct.size == 3)
    val d = Seq("2020-01-01", "2020-01-02", "2024-06-30")
      .map(java.sql.Date.valueOf)
    val dord = d.toDF("d")
      .select(ZOrder.ordinate(col("d"), DateType).as("o"))
      .collect().map(_.getDouble(0)).toSeq
    assert(dord == Seq(18262.0, 18263.0, 19904.0), dord.toString)
    // booleans: false < true
    val bo = Seq(false, true).toDF("b")
      .select(ZOrder.ordinate(col("b"), BooleanType).as("o"))
      .collect().map(_.getDouble(0)).toSeq
    assert(bo == Seq(0.0, 1.0))
    intercept[IllegalArgumentException] {
      ZOrder.ordinate(col("x"), ArrayType(LongType))
    }
  }
}
