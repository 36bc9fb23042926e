package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Focused tests for the r21 optimization-round internals:
  *
  *  - [[Tables.spread]] — the scale-adaptive scan spread (guide §2.5):
  *    fires only when the planned scan parallelism is under half the
  *    session's default parallelism, is identity on rows, and is
  *    disabled by `spark.graft.scan.spread=false`;
  *  - the PageRank `cutEvery` lineage-cut interval — bit-identical
  *    ranks with and without per-iteration cuts;
  *  - the hamming-candidate null-fingerprint guard — the WHEN-guarded
  *    explode (which avoids the pushed-filter double evaluation of the
  *    fingerprint expression, guide §4.4) drops null-fp rows exactly
  *    like the old Filter did.
  */
class SpreadSpec extends AnyFunSuite with SparkTestBase {

  test("spread raises a one-split scan to default parallelism " +
    "without changing rows") {
    val docs = Tables.documents(spark, sfDir)
    val before = docs.rdd.getNumPartitions
    assert(before * 2 <= spark.sparkContext.defaultParallelism,
      s"precondition: testdata must under-parallelize (got $before)")
    val sp = Tables.spread(docs)
    assert(sp.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
    // identity on content
    assert(sp.orderBy(col("doc_id")).collect().toSeq ===
      docs.orderBy(col("doc_id")).collect().toSeq)
  }

  test("spread is a no-op when the scan already parallelizes") {
    val wide = spark.range(0, 1000)
      .repartition(spark.sparkContext.defaultParallelism)
      .toDF("v")
    // already at target parallelism: the SAME plan comes back
    assert(Tables.spread(wide) eq wide)
  }

  test("spread honors spark.graft.scan.spread=false") {
    val docs = Tables.documents(spark, sfDir)
    spark.conf.set("spark.graft.scan.spread", "false")
    try assert(Tables.spread(docs) eq docs)
    finally spark.conf.unset("spark.graft.scan.spread")
  }

  test("pagerank ranks are bit-identical across cutEvery intervals") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L),
      (3L, 1L), (4L, 5L), (5L, 4L)).toDF("src", "dst")
    def run(cutEvery: Int) =
      graft.operators.PageRank.run(pairs, iters = 5, cutEvery = cutEvery)
        .orderBy(col("id")).collect().toSeq
    assert(run(1) === run(2))
    assert(run(1) === run(5))
  }

  test("hamming candidates skip null fingerprints (guarded explode " +
    "equals the old filter semantics)") {
    import spark.implicits._
    val fps = Seq((1L, Some(0L)), (2L, Some(0L)), (3L, None),
      (4L, Some(-1L))).toDF("doc_id", "fp")
    val pairs = graft.dedup.Dedup.hammingCandidates(fps, chunkBits = 16)
      .orderBy(col("id_a"), col("id_b")).collect()
    // null-fp doc 3 pairs with nobody; 1-2 collide on every chunk;
    // 4 (all bits set) shares no 16-bit chunk with 0
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 2L)))
  }
}
