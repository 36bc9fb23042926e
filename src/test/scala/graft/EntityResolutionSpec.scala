package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{EditSimilarity, EntityResolution}

/** Incremental entity resolution vs batch ground truth: after EVERY
  * ingested batch, the incremental assignments must equal what the
  * batch-mode composition (EditSimilarity edges → Dedup.clusters →
  * min-label) computes over everything ingested so far — including a
  * planted cross-batch entity MERGE and the short-string branch. This
  * is the running-union-find ≡ final-connected-components claim that
  * lets the declared query share the batch oracle.
  */
class EntityResolutionSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def df(rows: (Long, String)*): DataFrame =
    rows.toDF("id", "s")

  /** Batch-mode ground truth over the union ingested so far. */
  private def batchResolve(all: DataFrame): Map[Long, Long] = {
    val edges = EditSimilarity.selfJoin(all, "id", "s", d = 1, q = 2)
      .select(col("id_a"), col("id_b"))
    val comp = graft.dedup.Dedup.clusters(edges)
    all.select(col("id").cast("long").as("id"))
      .join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id"))
        .as("entity_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def current(root: String): Map[Long, Long] =
    EntityResolution.entities(spark, root).get
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[Long]("entity_id")).toMap

  test("incremental assignments equal batch resolution after every " +
      "batch — near-dup joins, cross-batch shorts, and a bridging " +
      "record that merges two existing entities") {
    val root = java.nio.file.Files
      .createTempDirectory("er_inc").toFile.getAbsolutePath + "/er"
    // batch 0: an alpha pair, a loner, a short, one half of the
    // future merge
    val b0 = df(1L -> "alpha", 2L -> "alphx", 3L -> "zebra",
      10L -> "ab", 40L -> "spark")
    // batch 1: joins the alpha entity and the zebra entity from the
    // index, a short matching batch-0's short, the OTHER merge half
    // (edit(spark, share) = 2 — genuinely separate entities so far)
    val b1 = df(4L -> "alpho", 5L -> "zebrb", 11L -> "ac",
      50L -> "share")
    // batch 2: the bridge — edit(shark, spark) = 1 AND
    // edit(shark, share) = 1, so entities 40 and 50 must MERGE
    val b2 = df(60L -> "shark")

    val a0 = EntityResolution.resolveBatch(spark, root, b0, "id", "s",
      d = 1, q = 2, batchId = 0L)
    assert(a0.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      batchResolve(b0))
    assert(current(root) == batchResolve(b0))

    EntityResolution.resolveBatch(spark, root, b1, "id", "s",
      d = 1, q = 2, batchId = 1L)
    val u01 = b0.unionByName(b1)
    assert(current(root) == batchResolve(u01))
    // the cross-batch SHORT pair landed in one entity
    assert(current(root)(11L) == current(root)(10L))
    // spark and share are still separate entities
    assert(current(root)(40L) == 40L && current(root)(50L) == 50L)

    EntityResolution.resolveBatch(spark, root, b2, "id", "s",
      d = 1, q = 2, batchId = 2L)
    val u012 = u01.unionByName(b2)
    val got = current(root)
    assert(got == batchResolve(u012),
      s"incremental $got != batch ${batchResolve(u012)}")
    // the merge happened: all three resolve to the minimum id, and
    // entity 50's prior rows were rewritten, not orphaned
    assert(got(40L) == 40L && got(50L) == 40L && got(60L) == 40L)

    // replayed batch: assignments unchanged, ingest no-ops through
    // the replay guard (version still 2 after re-delivery)
    val v = graft.streaming.CdcApply.currentVersion(spark,
      s"$root/postings")
    EntityResolution.resolveBatch(spark, root, b2, "id", "s",
      d = 1, q = 2, batchId = 2L)
    assert(current(root) == got, "replay changed assignments")
    assert(graft.streaming.CdcApply.currentVersion(spark,
      s"$root/postings") == v, "replay advanced the table")
  }

  test("a batch triggering 10^4 entity merges resolves through the " +
      "broadcast merge-map join without analyzer strain") {
    // N families; family i seeds two entities at edit distance 2
    // (…AA… / …BB…) whose midpoint bridge (…AB…) arrives in batch 1 —
    // exactly one merge per family. The id digits appear TWICE in each
    // string, so any two distinct families are >= 2 edits (or >= 2
    // length) apart and never match at d = 1.
    val n = 10000
    val root = java.nio.file.Files
      .createTempDirectory("er_big").toFile.getAbsolutePath + "/er"
    def s(i: Int, mid: String) = s"$i$mid$i"
    val seed = (0 until n).flatMap(i =>
      Seq((2L * i) -> s(i, "AA"), (2L * i + 1) -> s(i, "BB")))
    val bridges = (0 until n).map(i => (100000L + i) -> s(i, "AB"))
    EntityResolution.resolveBatch(spark, root, df(seed: _*), "id", "s",
      d = 1, q = 4, batchId = 0L)
    // before the bridges: every record is its own entity
    val pre = current(root)
    assert(pre.size == 2 * n && pre.forall { case (k, v) => k == v })
    val a1 = EntityResolution.resolveBatch(spark, root,
      df(bridges: _*), "id", "s", d = 1, q = 4, batchId = 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every bridge resolved to its family minimum (2i)...
    assert(a1.size == n)
    (0 until n).foreach(i => assert(a1(100000L + i) == 2L * i))
    // ...and all 10^4 absorbed entities (2i+1) were rewritten in the
    // index — spot-check the full read-back at the edges and middle
    val got = current(root)
    assert(got.size == 3 * n)
    Seq(0, 1, n / 2, n - 2, n - 1).foreach { i =>
      assert(got(2L * i) == 2L * i && got(2L * i + 1) == 2L * i &&
        got(100000L + i) == 2L * i, s"family $i not merged: $got")
    }
    assert(got.count { case (k, v) => k != v } == 2 * n)
  }

  test("two independent builds are bit-identical (frozen order, " +
      "deterministic min-label)") {
    def build(): Map[Long, Long] = {
      val root = java.nio.file.Files
        .createTempDirectory("er_det").toFile.getAbsolutePath + "/er"
      EntityResolution.resolveBatch(spark, root,
        df(1L -> "stone", 2L -> "stonx", 9L -> "qq"), "id", "s",
        1, 2, 0L)
      EntityResolution.resolveBatch(spark, root,
        df(3L -> "stony", 8L -> "qr"), "id", "s", 1, 2, 1L)
      current(root)
    }
    assert(build() == build())
  }
}
