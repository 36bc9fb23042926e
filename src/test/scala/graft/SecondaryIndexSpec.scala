package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{CdcApply => C, SecondaryIndex => SI}

/** Secondary index over a CDC table: incremental sync (touched-bucket
  * recompute, migration tombstones), bucket-pruned lookupBy, the
  * staleness contract (false negatives bounded by sync lag, false
  * positives impossible), layout independence across a source
  * rebucket, and the bucketCols layout knob underneath it all.
  */
class SecondaryIndexSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(prefix: String): String = java.nio.file.Files
    .createTempDirectory(prefix).toFile.getAbsolutePath

  /** Rows: (key, version, nation, balance, deleted). */
  private def applySrc(root: String,
      rows: Seq[(Long, Long, String, Long, Boolean)], id: Long,
      numBuckets: Int = 8): Boolean = {
    import spark.implicits._
    C.applyBatch(rows.toDF("k", "version", "nation", "bal", "deleted"),
      id, root, Seq("k"), "version", Some("deleted"),
      numBuckets = numBuckets, commitTs = Some(1000L * (id + 1)))
  }

  private def lookupSet(root: String, idx: String,
      nation: String): Set[(Long, Long)] = {
    import spark.implicits._
    SI.lookupBy(spark, root, idx, Seq(nation)).get
      .select($"k", $"bal").as[(Long, Long)].collect().toSet
  }

  test("sync + lookupBy: equality probe returns exactly the live " +
      "matching rows, with the snapshot's visible shape") {
    val (root, idx) = (tmp("si_src"), tmp("si_idx"))
    assert(SI.lookupBy(spark, root, idx, Seq("FR")).isEmpty,
      "no index yet must be None")
    assert(applySrc(root, Seq(
      (1L, 1L, "FR", 10L, false), (2L, 1L, "FR", 20L, false),
      (3L, 1L, "DE", 30L, false), (4L, 1L, "JP", 40L, false)), 0L))
    assert(SI.syncIndex(spark, root, idx, Seq("nation"),
      commitTs = Some(10L)))
    assert(!SI.syncIndex(spark, root, idx, Seq("nation")),
      "caught-up sync must be a no-op")
    assert(lookupSet(root, idx, "FR") == Set(1L -> 10L, 2L -> 20L))
    assert(lookupSet(root, idx, "DE") == Set(3L -> 30L))
    assert(lookupSet(root, idx, "XX") == Set.empty)
    // visible shape: no internal or deleted columns
    val cols = SI.lookupBy(spark, root, idx, Seq("FR")).get.columns.toSet
    assert(cols == Set("k", "version", "nation", "bal"))
  }

  test("incremental sync: deletes and indexed-value migrations " +
      "tombstone the stale pair; new rows appear") {
    val (root, idx) = (tmp("si_incr_src"), tmp("si_incr_idx"))
    assert(applySrc(root, Seq(
      (1L, 1L, "FR", 10L, false), (2L, 1L, "FR", 20L, false),
      (3L, 1L, "DE", 30L, false)), 0L))
    assert(SI.syncIndex(spark, root, idx, Seq("nation"),
      commitTs = Some(10L)))
    // k=1 migrates FR -> DE, k=2 is deleted, k=5 is new in JP
    assert(applySrc(root, Seq(
      (1L, 2L, "DE", 11L, false), (2L, 2L, "", 0L, true),
      (5L, 1L, "JP", 50L, false)), 1L))
    assert(SI.syncIndex(spark, root, idx, Seq("nation"),
      commitTs = Some(20L)))
    assert(lookupSet(root, idx, "FR") == Set.empty,
      "migrated + deleted rows must leave the old value's result")
    assert(lookupSet(root, idx, "DE") == Set(1L -> 11L, 3L -> 30L))
    assert(lookupSet(root, idx, "JP") == Set(5L -> 50L))
  }

  test("staleness contract: a lagging index misses new rows but " +
      "never returns a row that no longer matches") {
    val (root, idx) = (tmp("si_stale_src"), tmp("si_stale_idx"))
    assert(applySrc(root, Seq(
      (1L, 1L, "FR", 10L, false), (2L, 1L, "DE", 20L, false)), 0L))
    assert(SI.syncIndex(spark, root, idx, Seq("nation"),
      commitTs = Some(10L)))
    // source moves on, index does NOT: k=1 migrates to DE, k=9 is new
    assert(applySrc(root, Seq(
      (1L, 2L, "DE", 11L, false), (9L, 1L, "FR", 90L, false)), 1L))
    // stale hit (1, FR) re-checks against the SOURCE row and drops —
    // no false positive; the new FR row is missed — false negative
    // bounded by sync lag, as documented
    assert(lookupSet(root, idx, "FR") == Set.empty)
    // k=1 under its NEW value is missed too (the index has no entry)
    assert(lookupSet(root, idx, "DE") == Set(2L -> 20L))
    // one sync restores exactness
    assert(SI.syncIndex(spark, root, idx, Seq("nation"),
      commitTs = Some(20L)))
    assert(lookupSet(root, idx, "FR") == Set(9L -> 90L))
    assert(lookupSet(root, idx, "DE") == Set(1L -> 11L, 2L -> 20L))
  }

  test("property: under arbitrary sync lag, lookupBy never returns a " +
      "non-matching row, and misses ONLY keys changed after the index " +
      "watermark — the lost-update bound as a checked invariant") {
    val rnd = new scala.util.Random(7)
    val nations = Seq("FR", "DE", "JP")
    // model: key -> (version, nation, bal, deleted, lastChangedBatch)
    var model = Map.empty[Long, (Long, String, Long, Boolean, Long)]
    val (root, idx) = (tmp("si_prop_src"), tmp("si_prop_idx"))
    val numBatches = 6
    val syncAt = 2L // index watermark frozen here; batches 3-5 unseen
    (0L until numBatches).foreach { b =>
      val touched = rnd.shuffle((1L to 30L).toList).take(8)
      val rows = touched.map { k =>
        val ver = model.get(k).map(_._1 + 1).getOrElse(1L)
        val del = model.contains(k) && rnd.nextInt(4) == 0
        val nat = nations(rnd.nextInt(nations.size))
        val bal = rnd.nextInt(1000).toLong
        model += k -> ((ver, nat, bal, del, b))
        (k, ver, nat, bal, del)
      }
      assert(applySrc(root, rows, b))
      if (b == syncAt)
        assert(SI.syncIndex(spark, root, idx, Seq("nation"),
          commitTs = Some(10L * (b + 1))))
    }
    nations.foreach { n =>
      // current truth: live rows whose nation is n
      val truth = model.collect {
        case (k, (_, nat, bal, del, _)) if !del && nat == n => k -> bal
      }.toSet
      val got = lookupSet(root, idx, n)
      // NO false positive, ever: every returned row matches right now
      assert(got.subsetOf(truth),
        s"nation $n returned non-matching rows: ${got -- truth}")
      // false negatives are exactly bounded by sync lag: a missed key
      // must have changed in a batch the index has not seen
      val missed = truth.filterNot(got.contains)
      missed.foreach { case (k, _) =>
        assert(model(k)._5 > syncAt,
          s"nation $n missed key $k last changed at batch " +
            s"${model(k)._5} <= watermark $syncAt")
      }
    }
    // one catch-up sync restores exactness everywhere
    assert(SI.syncIndex(spark, root, idx, Seq("nation"),
      commitTs = Some(1000L)))
    nations.foreach { n =>
      val truth = model.collect {
        case (k, (_, nat, bal, del, _)) if !del && nat == n => k -> bal
      }.toSet
      assert(lookupSet(root, idx, n) == truth, s"nation $n after sync")
    }
  }

  test("lookupBy prunes: one index bucket family, only the source " +
      "buckets holding matches") {
    import spark.implicits._
    val (root, idx) = (tmp("si_prune_src"), tmp("si_prune_idx"))
    // 50 keys over 8 source buckets, 2 nations; nation A has keys in
    // a strict subset of source buckets
    val rows = (1L to 50L).map(k =>
      (k, 1L, if (k <= 4) "A" else "B", k * 10L, false))
    assert(applySrc(root, rows, 0L, numBuckets = 8))
    assert(SI.syncIndex(spark, root, idx, Seq("nation"),
      numBuckets = 4, commitTs = Some(10L)))
    val out = SI.lookupBy(spark, root, idx, Seq("A")).get
    assert(out.select($"k").as[Long].collect().toSet ==
      (1L to 4L).toSet)
    val srcBucketsOfA = Seq(1L, 2L, 3L, 4L).map(k =>
      Seq(k).toDF("k")
        .select(pmod(xxhash64($"k"), lit(8L)).cast("int"))
        .head().getInt(0)).distinct
    // the executed read listed one index bucket dir + exactly the
    // source bucket dirs the matching keys hash to
    val dirs = out.inputFiles.map(_.replaceAll("/[^/]*$", "")).distinct
    // inputFiles carry a file: scheme prefix — match on the path body
    val (idxDirs, srcDirs) = dirs.partition(_.contains(idx))
    assert(idxDirs.length == 1, s"index side read ${idxDirs.toSeq}")
    assert(srcDirs.length == srcBucketsOfA.size,
      s"source side read ${srcDirs.toSeq}, wanted ${srcBucketsOfA.size}")
  }

  test("index survives a source rebucket with no resync: content is " +
      "layout-independent, probes recompute buckets") {
    val (root, idx) = (tmp("si_rb_src"), tmp("si_rb_idx"))
    assert(applySrc(root, (1L to 30L).map(k =>
      (k, 1L, if (k % 3 == 0) "FR" else "DE", k, false)), 0L,
      numBuckets = 4))
    assert(SI.syncIndex(spark, root, idx, Seq("nation"),
      commitTs = Some(10L)))
    val before = lookupSet(root, idx, "FR")
    assert(C.rebucket(spark, root, 9))
    // no sync in between: the probe recomputes source buckets under
    // the NEW layout and must find every row
    assert(lookupSet(root, idx, "FR") == before)
    // and the next sync sees nothing to do (rebucket moved rows, not
    // content — its dirs keep the old batch id)
    assert(!SI.syncIndex(spark, root, idx, Seq("nation"),
      commitTs = Some(20L)))
  }

  test("spec sentinel: a drifted indexed-column list refuses loudly") {
    val (root, idx) = (tmp("si_spec_src"), tmp("si_spec_idx"))
    assert(applySrc(root, Seq((1L, 1L, "FR", 10L, false)), 0L))
    assert(SI.syncIndex(spark, root, idx, Seq("nation"),
      commitTs = Some(10L)))
    val e = intercept[IllegalStateException] {
      SI.syncIndex(spark, root, idx, Seq("bal"))
    }
    assert(e.getMessage.contains("fixed at first sync"), e.getMessage)
    // indexing a source KEY column is refused outright
    val e2 = intercept[IllegalArgumentException] {
      SI.syncIndex(spark, root, tmp("si_spec_idx2"), Seq("k"))
    }
    assert(e2.getMessage.contains("primary key"), e2.getMessage)
  }

  test("NULL indexed values are not indexed") {
    import spark.implicits._
    val (root, idx) = (tmp("si_null_src"), tmp("si_null_idx"))
    val rows = Seq[(Long, Long, Option[String], Long, Boolean)](
      (1L, 1L, Some("FR"), 10L, false), (2L, 1L, None, 20L, false))
    assert(C.applyBatch(
      rows.toDF("k", "version", "nation", "bal", "deleted"),
      0L, root, Seq("k"), "version", Some("deleted"),
      commitTs = Some(1000L)))
    assert(SI.syncIndex(spark, root, idx, Seq("nation"),
      commitTs = Some(10L)))
    assert(lookupSet(root, idx, "FR") == Set(1L -> 10L))
    // the index table holds exactly one live entry
    assert(C.readSnapshot(spark, idx).get.count() == 1L)
  }

  test("bucketCols layout knob: rows co-locate by the declared " +
      "subset, manifest round-trips it, full-key lookup still prunes") {
    import spark.implicits._
    val root = tmp("bcols")
    def apply(rows: Seq[(String, Long, Long, Long)], id: Long): Boolean =
      C.applyBatch(rows.toDF("tenant", "item", "version", "qty"),
        id, root, Seq("tenant", "item"), "version", None,
        numBuckets = 8, bucketCols = Some(Seq("tenant")),
        commitTs = Some(1000L * (id + 1)))
    assert(apply((1L to 20L).map(i => ("acme", i, 1L, i * 2L)) ++
      (1L to 20L).map(i => ("globex", i, 1L, i * 3L)), 0L))
    // every row of one tenant sits in ONE bucket directory
    val dirsOf = C.buckets(spark, root)
      .select("bucket_id").as[Int].collect().toSeq
    assert(dirsOf.size <= 2, s"two tenants must fill <= 2 buckets: $dirsOf")
    // full-key point lookup works and prunes to the tenant's bucket
    val hit = C.lookup(spark, root, Seq("acme", 7L)).get
    assert(hit.select($"qty").as[Long].collect().toSeq == Seq(14L))
    assert(hit.inputFiles.map(_.replaceAll("/[^/]*$", ""))
      .distinct.length == 1)
    // the knob survives the manifest round-trip: a second apply under
    // the recorded layout keeps the co-location
    assert(apply(Seq(("acme", 21L, 1L, 42L)), 1L))
    assert(C.buckets(spark, root)
      .select("bucket_id").as[Int].collect().toSeq.size <= 2)
    // a non-subset declaration refuses
    val e = intercept[IllegalArgumentException] {
      C.applyBatch(Seq(("x", 1L, 1L, 1L))
        .toDF("tenant", "item", "version", "qty"),
        9L, tmp("bcols2"), Seq("tenant", "item"), "version", None,
        bucketCols = Some(Seq("qty")))
    }
    assert(e.getMessage.contains("subset"), e.getMessage)
  }
}
