package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.streaming.{CdcApply, Rollup}

/** The incrementally-maintained materialized aggregate: partial rows
  * keyed (source bucket, group) in a CDC table, refreshed by
  * recomputing only manifest-touched source buckets. The invariant
  * under test everywhere: after any sync sequence,
  * `readRollup == direct groupBy over the current snapshot`.
  */
class RollupSpec extends AnyFunSuite with SparkTestBase {

  private val C = CdcApply
  private val R = Rollup

  private def tmp(prefix: String): String = java.nio.file.Files
    .createTempDirectory(prefix).toFile.getAbsolutePath

  private def bucketOf(k: Long, n: Int): Int = {
    import spark.implicits._
    Seq(k).toDF("k")
      .select(pmod(xxhash64($"k"), lit(n.toLong)).cast("int"))
      .head().getInt(0)
  }

  private val aggs = Seq(R.Agg("cnt", "count"),
    R.Agg("total", "sum", "amount"), R.Agg("hi", "max", "amount"))

  private def applySrc(root: String,
      rows: Seq[(Long, Long, String, Long, Boolean)], id: Long,
      nb: Int = 4): Boolean = {
    import spark.implicits._
    C.applyBatch(rows.toDF("k", "version", "g", "amount", "deleted"),
      id, root, Seq("k"), "version", Some("deleted"), numBuckets = nb)
  }

  /** Direct aggregate over the live snapshot — the ground truth. */
  private def direct(root: String): Map[String, (Long, Long, Long)] =
    C.readSnapshot(spark, root).map(_.groupBy(col("g"))
      .agg(count(lit(1)), sum(col("amount")), max(col("amount")))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap).getOrElse(Map.empty)

  private def served(roll: String): Map[String, (Long, Long, Long)] =
    R.readRollup(spark, roll, Seq("g"), aggs).map(_.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap).getOrElse(Map.empty)

  test("rollup equals the direct aggregate across trickle syncs, " +
    "deletes and group migration included; only touched partials move") {
    val src = tmp("rollup_src")
    val roll = tmp("rollup_dst")
    // batch 0: 40 keys in two groups
    assert(applySrc(src, (1L to 40L).map(k =>
      (k, 1L, if (k % 2 == 0) "even" else "odd", k, false)), 0L))
    assert(R.syncRollup(spark, src, roll, Seq("g"), aggs,
      numBuckets = 2))
    assert(served(roll) == direct(src))
    // batch 1: delete a key, update another, and MIGRATE k=3 from
    // "odd" to "even" — the pre-image case a feed-based incremental
    // view cannot decrement; bucket recompute must handle it exactly
    assert(applySrc(src, Seq((2L, 2L, "even", 2L, true),
      (4L, 2L, "even", 400L, false), (3L, 2L, "even", 3L, false)), 1L))
    assert(R.syncRollup(spark, src, roll, Seq("g"), aggs,
      numBuckets = 2))
    assert(served(roll) == direct(src))
    assert(C.currentVersion(spark, roll).contains(1L))
    // incrementality: the rollup's own change feed since the first
    // sync carries ONLY partials of source buckets batch 1 touched —
    // untouched buckets' partials were carried forward, not rewritten
    val touched = Seq(2L, 4L, 3L).map(bucketOf(_, 4)).toSet
    val moved = C.changesSince(spark, roll, 0L).get
      .select(R.SrcBucketCol).distinct().collect()
      .map(_.getInt(0)).toSet
    assert(moved.nonEmpty && moved.subsetOf(touched),
      s"partials of untouched source buckets moved: $moved vs $touched")
    // replayed sync is a no-op
    assert(!R.syncRollup(spark, src, roll, Seq("g"), aggs,
      numBuckets = 2))
  }

  test("a group that empties is tombstoned out of the rollup and " +
    "serves nothing; it reappears cleanly") {
    val src = tmp("rollup_gone_src")
    val roll = tmp("rollup_gone_dst")
    assert(applySrc(src, Seq((1L, 1L, "a", 10L, false),
      (2L, 1L, "b", 20L, false)), 0L))
    assert(R.syncRollup(spark, src, roll, Seq("g"), aggs))
    assert(served(roll).keySet == Set("a", "b"))
    // delete the only "b" row: its (bucket, group) partial must die
    assert(applySrc(src, Seq((2L, 2L, "b", 20L, true)), 1L))
    assert(R.syncRollup(spark, src, roll, Seq("g"), aggs))
    assert(served(roll) == direct(src))
    assert(!served(roll).contains("b"), served(roll).toString)
    // and return: a later batch revives the group
    assert(applySrc(src, Seq((9L, 1L, "b", 90L, false)), 2L))
    assert(R.syncRollup(spark, src, roll, Seq("g"), aggs))
    assert(served(roll) == direct(src))
    assert(served(roll)("b") == ((1L, 90L, 90L)))
  }

  test("a source rebucket invalidates the layout epoch: the next sync " +
    "fully recomputes instead of trusting partials keyed by a dead " +
    "layout") {
    val src = tmp("rollup_rb_src")
    val roll = tmp("rollup_rb_dst")
    assert(applySrc(src, (1L to 30L).map(k =>
      (k, 1L, s"g${k % 3}", k, false)), 0L, nb = 4))
    assert(R.syncRollup(spark, src, roll, Seq("g"), aggs))
    assert(served(roll) == direct(src))
    // rebucket 4 → 7 re-keys every row across source buckets
    assert(C.rebucket(spark, src, 7))
    // a post-rebucket trickle touches ONE bucket of the new layout;
    // without the epoch check the old-layout partials would double-
    // count everything outside it
    assert(applySrc(src, Seq((1L, 2L, "g1", 100L, false)), 1L, nb = 4))
    assert(R.syncRollup(spark, src, roll, Seq("g"), aggs))
    assert(served(roll) == direct(src))
    // partials now record the new layout
    val nbs = C.readSnapshot(spark, roll).get
      .select(R.SrcLayoutCol).distinct().collect().map(_.getInt(0))
    assert(nbs.toSeq == Seq(7), nbs.mkString(","))
  }

  test("empty source: the first sync advances the watermark with an " +
    "empty rollup instead of wedging; a fully-emptied source " +
    "tombstones every partial") {
    val src = tmp("rollup_empty_src")
    val roll = tmp("rollup_empty_dst")
    // retention 0: the delete empties the table at its own apply
    import spark.implicits._
    assert(C.applyBatch(
      Seq((1L, 1L, "a", 10L, false))
        .toDF("k", "version", "g", "amount", "deleted"),
      0L, src, Seq("k"), "version", Some("deleted"), numBuckets = 2,
      tombstoneRetention = 0))
    assert(R.syncRollup(spark, src, roll, Seq("g"), aggs))
    assert(served(roll) == direct(src))
    assert(C.applyBatch(
      Seq((1L, 2L, "a", 10L, true))
        .toDF("k", "version", "g", "amount", "deleted"),
      1L, src, Seq("k"), "version", Some("deleted"), numBuckets = 2,
      tombstoneRetention = 0))
    // the rollup does NOT consume the tombstone feed, so unlike a
    // mirror there is no retention hazard: the vanished bucket set
    // alone drives the partial tombstones
    assert(R.syncRollup(spark, src, roll, Seq("g"), aggs))
    assert(served(roll).isEmpty, served(roll).toString)
    assert(C.currentVersion(spark, roll).contains(1L))
    // fresh rollup of the already-empty source: watermark seeds, no
    // partials
    val roll2 = tmp("rollup_empty_dst2")
    assert(R.syncRollup(spark, src, roll2, Seq("g"), aggs))
    assert(C.currentVersion(spark, roll2).contains(1L))
    assert(served(roll2).isEmpty)
    assert(!R.syncRollup(spark, src, roll2, Seq("g"), aggs))
    // REVIVAL regression: roll2's watermark commit is a zero-bucket
    // manifest with no schema line; when the source comes back to
    // life, the next sync's applyBatch must seed the table from the
    // batch's own schema instead of trying to footer-recover one from
    // zero data files (this crashed before the empty-manifest guard)
    assert(C.applyBatch(
      Seq((2L, 1L, "z", 70L, false))
        .toDF("k", "version", "g", "amount", "deleted"),
      2L, src, Seq("k"), "version", Some("deleted"), numBuckets = 2,
      tombstoneRetention = 0))
    assert(R.syncRollup(spark, src, roll2, Seq("g"), aggs))
    assert(served(roll2) == direct(src))
    assert(served(roll2)("z") == ((1L, 70L, 70L)))
  }

  test("spec drift is refused loudly: an added aggregate or a swapped " +
    "fn cannot silently miscombine") {
    val src = tmp("rollup_spec_src")
    val roll = tmp("rollup_spec_dst")
    assert(applySrc(src, Seq((1L, 1L, "a", 10L, false)), 0L))
    assert(R.syncRollup(spark, src, roll, Seq("g"), aggs))
    // added aggregate: the CDC schema gate would welcome it as
    // additive evolution (NULL partials on untouched buckets — a
    // silent undercount); the spec sentinel refuses instead
    assert(applySrc(src, Seq((2L, 1L, "a", 20L, false)), 1L))
    val widened = aggs :+ R.Agg("lo", "min", "amount")
    val e1 = intercept[IllegalStateException] {
      R.syncRollup(spark, src, roll, Seq("g"), widened)
    }
    assert(e1.getMessage.contains("rollup spec mismatch"), e1.getMessage)
    // same-typed fn swap (sum → max): types match, so only the
    // sentinel can catch it — at read time too
    val swapped = Seq(R.Agg("cnt", "count"),
      R.Agg("total", "max", "amount"), R.Agg("hi", "max", "amount"))
    val e2 = intercept[IllegalStateException] {
      R.readRollup(spark, roll, Seq("g"), swapped)
    }
    assert(e2.getMessage.contains("rollup spec mismatch"), e2.getMessage)
    // the faithful caller still syncs and serves
    assert(R.syncRollup(spark, src, roll, Seq("g"), aggs))
    assert(served(roll) == direct(src))
  }

  test("governance composes with the rollup: a location-registered " +
    "rollup serves only the principal's groups") {
    import graft.governance._
    val src = tmp("rollup_gov_src")
    val roll = tmp("rollup_gov_dst")
    assert(applySrc(src, (1L to 20L).map(k =>
      (k, 1L, if (k % 2 == 0) "even" else "odd", k, false)), 0L))
    assert(R.syncRollup(spark, src, roll, Seq("g"), aggs))
    GovernanceCatalog.registerLocation(roll, "rollup_db", "sales_agg")
    // allowlist = group + partial columns + the rollup's deleted flag
    // (tombstone filtering runs above the injected projection, the
    // same rule as every governed CDC read); the layout/bucket
    // internals stay ungranted and the serve never needs them
    GovernanceCatalog.register(Analyst, "rollup_db", DataCellsFilter(
      "analyst-rollup", "sales_agg", "g = 'even'",
      Seq("g", "cnt", "total", "hi", R.DeletedCol)))
    val out = Governance.withPrincipal(spark, Analyst) {
      R.readRollup(spark, roll, Seq("g"), aggs).get.collect()
    }
    assert(out.map(_.getString(0)).toSeq == Seq("even"),
      out.toSeq.toString)
    assert(out.head.getLong(1) == 10L && out.head.getLong(2) == 110L,
      out.toSeq.toString)
  }

  test("startRollup: the materialized view follows the merging source " +
    "across ticks; idle ticks no-op") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val src = tmp("rollup_stream_src")
    val roll = tmp("rollup_stream_dst")
    assert(applySrc(src, (1L to 20L).map(k =>
      (k, 1L, s"g${k % 2}", k, false)), 0L))
    val ticks = MemoryStream[Long](spark)
    val q = R.startRollup(spark, src, roll, Seq("g"), aggs,
      ticker = Some(ticks.toDF()))
    try {
      ticks.addData(1L); q.processAllAvailable()
      assert(served(roll) == direct(src), "seed tick did not refresh")
      // idle tick: watermark at head, nothing rewritten
      val head = C.currentVersion(spark, roll)
      ticks.addData(2L); q.processAllAvailable()
      assert(C.currentVersion(spark, roll) == head)
      // source merges on; the next tick carries the delta
      assert(applySrc(src, Seq((1L, 2L, "g1", 500L, false),
        (2L, 2L, "g0", 2L, true)), 1L))
      ticks.addData(3L); q.processAllAvailable()
      assert(served(roll) == direct(src))
    } finally q.stop()
  }

  test("property: rollup over a random change history equals the " +
    "reference aggregate after every sync cadence") {
    import spark.implicits._
    val histGen: Gen[List[(Long, Long, Long, Boolean)]] = for {
      n <- Gen.chooseNum(6, 18)
      keys <- Gen.listOfN(n, Gen.chooseNum(0L, 5L))
      pay <- Gen.listOfN(n, Gen.chooseNum(0L, 999L))
      del <- Gen.listOfN(n, Gen.prob(0.25))
      perm <- Gen.const(scala.util.Random.javaRandomToRandom(
        new java.util.Random(n * 7919L)).shuffle((1L to n.toLong).toList))
    } yield keys.lazyZip(perm).lazyZip(pay).lazyZip(del).toList
      .map { case (k, v, p, d) => (k, v, p, d) }
    val p = Prop.forAll(histGen, Gen.chooseNum(1, 4),
      Gen.chooseNum(1, 2)) { (history, nBatches, syncEvery) =>
      val src = tmp("rollup_prop_src")
      val roll = tmp("rollup_prop_dst")
      val size = math.max(1, history.size / nBatches)
      val chunks = history.grouped(size).toList
      val as = Seq(R.Agg("cnt", "count"), R.Agg("total", "sum", "pay"))
      chunks.zipWithIndex.foreach { case (rows, id) =>
        // group = pay % 3 — payload changes across versions, so keys
        // routinely migrate groups
        val df = rows.toDF("k", "version", "pay", "deleted")
          .withColumn("g", col("pay") % 3)
        C.applyBatch(df, id.toLong, src, Seq("k"), "version",
          Some("deleted"), numBuckets = 4)
        if (id % syncEvery == 0 || id == chunks.size - 1)
          R.syncRollup(spark, src, roll, Seq("g"), as, numBuckets = 4)
      }
      // reference: latest-wins per key, live rows grouped by pay % 3
      val expect = history.groupBy(_._1).values.map(_.maxBy(_._2))
        .filterNot(_._4).toSeq.groupBy(_._3 % 3)
        .map { case (g, rs) =>
          g -> ((rs.size.toLong, rs.map(_._3).sum)) }
      val got = R.readRollup(spark, roll, Seq("g"), as)
        .map(_.collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2)))).toMap)
        .getOrElse(Map.empty)
      val ok = got == expect
      if (!ok) println(s"[rollup-prop] history=$history " +
        s"syncEvery=$syncEvery got=$got expect=$expect")
      ok
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), p)
    assert(res.passed, res.status.toString)
  }
}
