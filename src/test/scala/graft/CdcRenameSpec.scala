package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.{DeltaInterop, IcebergInterop, IcebergV2}
import graft.streaming.CdcApply

/** Metadata-only column rename ([[CdcApply.renameColumn]]): one
  * manifest generation, zero data rewrite — reads project stored →
  * logical, applies translate logical → stored, time travel serves
  * each batch under its committed names, maintenance carries the
  * rename state, structural/type guards stay loud, and all three
  * exports republish under the new names.
  */
class CdcRenameSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(p: String): String = java.nio.file.Files
    .createTempDirectory(p).toFile.getAbsolutePath

  private def build(maxDeltas: Int = 0): String = {
    import spark.implicits._
    val root = tmp("ren_cdc")
    val b0 = Seq((1L, 1L, 10.0, false), (2L, 1L, 20.0, false),
      (3L, 1L, 30.0, false)).toDF("k", "version", "amount", "deleted")
    assert(CdcApply.applyBatch(b0, 0L, root, Seq("k"), "version",
      Some("deleted"), numBuckets = 2, commitTs = Some(1000L),
      maxDeltas = maxDeltas))
    root
  }

  private def amounts(df: org.apache.spark.sql.DataFrame,
      c: String): Map[Long, Double] =
    df.select("k", c).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("rename is metadata-only: zero data files move, reads serve " +
      "the logical name, later batches deliver it, time travel keeps " +
      "the committed-era name, the change feed translates") {
    import spark.implicits._
    val root = build()
    // batch 1 still under the ORIGINAL name (pre-rename era)
    assert(CdcApply.applyBatch(
      Seq((2L, 2L, 21.0, false)).toDF("k", "version", "amount", "deleted"),
      1L, root, Seq("k"), "version", Some("deleted"), numBuckets = 2,
      commitTs = Some(2000L)))
    val filesBefore = CdcApply.files(spark, root).count()
    assert(CdcApply.renameColumn(spark, root, "amount", "amt"))
    assert(CdcApply.files(spark, root).count() == filesBefore,
      "a rename must move no data")
    val snap = CdcApply.readSnapshot(spark, root).get
    assert(snap.columns.contains("amt") && !snap.columns.contains("amount"))
    assert(amounts(snap, "amt") == Map(1L -> 10.0, 2L -> 21.0, 3L -> 30.0))
    // idempotent replay
    assert(!CdcApply.renameColumn(spark, root, "amt", "amt"))
    // batch 2 arrives under the NEW name and merges into the stored col
    assert(CdcApply.applyBatch(
      Seq((1L, 2L, 11.0, false)).toDF("k", "version", "amt", "deleted"),
      2L, root, Seq("k"), "version", Some("deleted"), numBuckets = 2,
      commitTs = Some(3000L)))
    assert(amounts(CdcApply.readSnapshot(spark, root).get, "amt") ==
      Map(1L -> 11.0, 2L -> 21.0, 3L -> 30.0))
    // time travel: batch 0 committed under 'amount' (its manifest
    // generation predates the rename) — and still reads that way;
    // the rename generation rode batch 1's lineage, so batch 1
    // onward serves 'amt'
    val tt = CdcApply.readSnapshotAt(spark, root, 0L).get
    assert(tt.columns.contains("amount") && !tt.columns.contains("amt"))
    assert(CdcApply.readSnapshotAt(spark, root, 1L).get
      .columns.contains("amt"))
    // the change feed surfaces the logical name
    val feed = CdcApply.changesSince(spark, root, 1L).get
    assert(feed.columns.contains("amt") && !feed.columns.contains("amount"))
    assert(feed.select("k", "amt").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet == Set((1L, 11.0)))
    // lookup surfaces it too
    assert(CdcApply.lookup(spark, root, Seq(2L)).get
      .columns.contains("amt"))
  }

  test("guards: structural columns refuse, occupied names refuse, a " +
      "batch reviving the storage name refuses, the type-clash guard " +
      "survives the translation, rename-back drops the mapping") {
    import spark.implicits._
    val root = build()
    assert(CdcApply.renameColumn(spark, root, "amount", "amt"))
    intercept[IllegalArgumentException] {
      CdcApply.renameColumn(spark, root, "k", "kk") // key
    }
    intercept[IllegalArgumentException] {
      CdcApply.renameColumn(spark, root, "version", "v2") // version
    }
    intercept[IllegalArgumentException] {
      CdcApply.renameColumn(spark, root, "nope", "x") // unknown
    }
    intercept[IllegalArgumentException] {
      CdcApply.renameColumn(spark, root, "amt", "k") // occupied
    }
    intercept[IllegalArgumentException] {
      CdcApply.renameColumn(spark, root, "amt", "_ab") // reserved
    }
    // a batch delivering the OLD stored name is ambiguous — refused
    val e = intercept[IllegalArgumentException] {
      CdcApply.applyBatch(
        Seq((1L, 2L, 11.0, false))
          .toDF("k", "version", "amount", "deleted"),
        1L, root, Seq("k"), "version", Some("deleted"), numBuckets = 2,
        commitTs = Some(2000L))
    }
    assert(e.getMessage.contains("STORAGE name"), e.getMessage)
    // the type-clash guard fires on the TRANSLATED (stored) name
    val e2 = intercept[IllegalArgumentException] {
      CdcApply.applyBatch(
        Seq((1L, 2L, "oops", false)).toDF("k", "version", "amt", "deleted"),
        1L, root, Seq("k"), "version", Some("deleted"), numBuckets = 2,
        commitTs = Some(2000L))
    }
    assert(e2.getMessage.contains("type clash"), e2.getMessage)
    // rename BACK to the storage name drops the mapping entirely
    assert(CdcApply.renameColumn(spark, root, "amt", "amount"))
    val snap = CdcApply.readSnapshot(spark, root).get
    assert(snap.columns.contains("amount") && !snap.columns.contains("amt"))
  }

  test("maintenance carries the rename state: a merge-on-read apply, " +
      "compaction, and rebucket all keep serving the logical name") {
    import spark.implicits._
    val root = build(maxDeltas = 2)
    assert(CdcApply.renameColumn(spark, root, "amount", "amt"))
    assert(CdcApply.applyBatch(
      Seq((2L, 2L, 22.0, false)).toDF("k", "version", "amt", "deleted"),
      1L, root, Seq("k"), "version", Some("deleted"), numBuckets = 2,
      commitTs = Some(2000L), maxDeltas = 2))
    assert(amounts(CdcApply.readSnapshot(spark, root).get, "amt") ==
      Map(1L -> 10.0, 2L -> 22.0, 3L -> 30.0))
    assert(CdcApply.compactBuckets(spark, root))
    assert(amounts(CdcApply.readSnapshot(spark, root).get, "amt") ==
      Map(1L -> 10.0, 2L -> 22.0, 3L -> 30.0))
    assert(CdcApply.rebucket(spark, root, 4))
    val snap = CdcApply.readSnapshot(spark, root).get
    assert(snap.columns.contains("amt") && !snap.columns.contains("amount"))
  }

  test("all three exports republish under the new names after a " +
      "rename (full republish — the name-based readers cannot mix " +
      "name eras), then continue incrementally") {
    import spark.implicits._
    val root = build()
    val delta = tmp("ren_delta"); val ice = tmp("ren_ice")
    val ice2 = tmp("ren_ice2")
    assert(DeltaInterop.exportIncremental(spark, root, delta).contains(0L))
    assert(IcebergInterop.exportIncremental(spark, root, ice).contains(0L))
    assert(IcebergV2.exportIncremental(spark, root, ice2).contains(0L))
    assert(CdcApply.renameColumn(spark, root, "amount", "amt"))
    // rename alone moves every export (identity/rename fingerprint)
    assert(DeltaInterop.exportIncremental(spark, root, delta).contains(1L))
    assert(IcebergInterop.exportIncremental(spark, root, ice).contains(1L))
    assert(IcebergV2.exportIncremental(spark, root, ice2).contains(1L))
    Seq(DeltaInterop.readDelta(spark, delta),
        IcebergInterop.readIceberg(spark, ice),
        IcebergInterop.readIceberg(spark, ice2)).foreach { df =>
      assert(df.columns.contains("amt") && !df.columns.contains("amount"),
        df.columns.mkString(","))
      assert(amounts(df, "amt") == Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
    }
    // steady state resumes: no change → no new version anywhere
    assert(DeltaInterop.exportIncremental(spark, root, delta).isEmpty)
    assert(IcebergInterop.exportIncremental(spark, root, ice).isEmpty)
    assert(IcebergV2.exportIncremental(spark, root, ice2).isEmpty)
    // and a later trickle change is incremental again under new names
    assert(CdcApply.applyBatch(
      Seq((1L, 2L, 11.0, false)).toDF("k", "version", "amt", "deleted"),
      1L, root, Seq("k"), "version", Some("deleted"), numBuckets = 2,
      commitTs = Some(2000L)))
    assert(IcebergV2.exportIncremental(spark, root, ice2).contains(2L))
    assert(amounts(IcebergInterop.readIceberg(spark, ice2), "amt") ==
      Map(1L -> 11.0, 2L -> 20.0, 3L -> 30.0))
    assert(spark.read.parquet(s"$ice2/data/v2/data").count() == 1L,
      "post-rename syncs must be O(batch) again")
  }
}
