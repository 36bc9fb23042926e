package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DeltaInterop, DeletionVectors}
import graft.streaming.CdcApply

/** MERGE-ON-READ Delta export ([[DeltaInterop.exportMor]]): a sync
  * writes one new data file + deletion-vector updates — O(changed
  * rows), ZERO rewrite of prior data files — and the read-back equals
  * the CDC net state. Idempotent across a crash between the log
  * commit and the state write; foreign/mixed lineage refuses; big
  * delete sets go file-backed.
  */
class DeltaMorSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(p: String): String = java.nio.file.Files
    .createTempDirectory(p).toFile.getAbsolutePath

  private def buildCdc(): String = {
    import spark.implicits._
    val root = tmp("mor_cdc")
    val b0 = Seq((1L, 1L, 10.0, false), (2L, 1L, 20.0, false),
      (3L, 1L, 30.0, false)).toDF("k", "version", "amount", "deleted")
    assert(CdcApply.applyBatch(b0, 0L, root, Seq("k"), "version",
      Some("deleted"), numBuckets = 2, commitTs = Some(1000L)))
    root
  }

  private def state(df: org.apache.spark.sql.DataFrame)
      : Map[Long, Double] =
    df.select("k", "amount").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

  private def parquetsUnder(dir: String): Map[String, Long] = {
    val d = new java.io.File(dir)
    if (!d.exists()) Map.empty
    else d.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap
  }

  test("a sync is O(changed rows): one new data file + DV updates, " +
      "prior data files NEVER rewritten; read-back equals the CDC " +
      "net state; no-change syncs commit nothing") {
    import spark.implicits._
    val root = buildCdc()
    val delta = tmp("mor_delta")
    assert(DeltaInterop.exportMor(spark, root, delta).contains(0L))
    assert(state(DeltaInterop.readDelta(spark, delta)) ==
      Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
    val v0Files = parquetsUnder(s"$delta/mor/v0")
    assert(v0Files.nonEmpty)
    // update k=1, delete k=2
    assert(CdcApply.applyBatch(
      Seq((1L, 2L, 11.0, false), (2L, 2L, 20.0, true))
        .toDF("k", "version", "amount", "deleted"),
      1L, root, Seq("k"), "version", Some("deleted"), numBuckets = 2,
      commitTs = Some(2000L)))
    assert(DeltaInterop.exportMor(spark, root, delta).contains(1L))
    assert(state(DeltaInterop.readDelta(spark, delta)) ==
      Map(1L -> 11.0, 3L -> 30.0))
    // ZERO rewrite: the v0 parquet set is byte-for-byte untouched
    assert(parquetsUnder(s"$delta/mor/v0") == v0Files,
      "prior data files were rewritten — not merge-on-read")
    // the commit is DV-shaped: re-adds carry deletionVector, new
    // rows live under mor/v1
    val commit1 = java.nio.file.Files.readString(
      java.nio.file.Paths.get(
        s"$delta/_delta_log/00000000000000000001.json"))
    assert(commit1.contains("deletionVector"), commit1)
    assert(commit1.contains("mor/v1/"), commit1)
    // no CDC movement: nothing commits
    assert(DeltaInterop.exportMor(spark, root, delta).isEmpty)
    assert(!new java.io.File(delta,
      "_delta_log/00000000000000000002.json").exists())
    // IDEMPOTENT re-sync (crash between commit and state write):
    // roll the state's lastBatch back and re-run — net state
    // unchanged, no duplicates
    val statePath = s"$delta/_delta_log/_graft_mor_state.json"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(statePath),
      """{"format":"mor1","lastBatch":0,"version":0}""")
    new java.io.File(delta,
      "_delta_log/._graft_mor_state.json.crc").delete()
    assert(DeltaInterop.exportMor(spark, root, delta).contains(2L))
    assert(state(DeltaInterop.readDelta(spark, delta)) ==
      Map(1L -> 11.0, 3L -> 30.0))
    assert(DeltaInterop.readDelta(spark, delta).count() == 2L)
  }

  test("mixed lineage refuses; big delete sets go FILE-BACKED and " +
      "decode back exactly") {
    import spark.implicits._
    // a log written by exportSnapshot is not ours to MOR-extend
    val root = buildCdc()
    val other = tmp("mor_foreign")
    DeltaInterop.exportSnapshot(spark, root, other)
    val e = intercept[IllegalStateException] {
      DeltaInterop.exportMor(spark, root, other)
    }
    assert(e.getMessage.contains("MOR export state"), e.getMessage)
    // 2000 keys, 1800 deleted: the DV payload exceeds the inline cap
    // (roaring compresses hard — a few hundred deletes stay inline)
    val bigRoot = tmp("mor_big_cdc")
    val b0 = (1L to 2000L).map(i => (i, 1L, i.toDouble, false))
      .toDF("k", "version", "amount", "deleted")
    assert(CdcApply.applyBatch(b0, 0L, bigRoot, Seq("k"), "version",
      Some("deleted"), numBuckets = 2, commitTs = Some(1000L)))
    val bigDelta = tmp("mor_big_delta")
    assert(DeltaInterop.exportMor(spark, bigRoot, bigDelta)
      .contains(0L))
    val b1 = (1L to 1800L).map(i => (i, 2L, i.toDouble, true))
      .toDF("k", "version", "amount", "deleted")
    assert(CdcApply.applyBatch(b1, 1L, bigRoot, Seq("k"), "version",
      Some("deleted"), numBuckets = 2, commitTs = Some(2000L)))
    assert(DeltaInterop.exportMor(spark, bigRoot, bigDelta)
      .contains(1L))
    val got = DeltaInterop.readDelta(spark, bigDelta)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(got == (1801L to 2000L).toSet, s"${got.size} rows survived")
    // the vectors landed as files (storageType u)
    val dvFiles = new java.io.File(bigDelta).listFiles()
      .filter(_.getName.startsWith("deletion_vector_"))
    assert(dvFiles.nonEmpty, "expected file-backed deletion vectors")
  }
}
