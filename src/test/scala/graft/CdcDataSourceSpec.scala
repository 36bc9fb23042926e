package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CdcApply

/** The `format("cdc")` reader shim: snapshot + time travel through the
  * DataFrameReader protocol, pruning/filtering delegated into the
  * engine's own snapshot plan, writes refused.
  */
class CdcDataSourceSpec extends AnyFunSuite with SparkTestBase {

  private def newRoot(): String = java.nio.file.Files
    .createTempDirectory("cdc_ds").toFile.getAbsolutePath

  private def build(): String = {
    import spark.implicits._
    val root = newRoot()
    val b0 = Seq((1L, 1L, 10.0, false), (2L, 1L, 20.0, false),
      (3L, 1L, 30.0, false))
      .toDF("k", "version", "amount", "deleted")
    assert(CdcApply.applyBatch(b0, 0L, root, Seq("k"), "version",
      Some("deleted"), commitTs = Some(1000L)))
    val b1 = Seq((1L, 2L, 11.0, false), (3L, 2L, 30.0, true))
      .toDF("k", "version", "amount", "deleted")
    assert(CdcApply.applyBatch(b1, 1L, root, Seq("k"), "version",
      Some("deleted"), commitTs = Some(2000L)))
    root
  }

  private def rows(df: org.apache.spark.sql.DataFrame)
      : Set[(Long, Double)] =
    df.select("k", "amount").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet

  test("format(\"cdc\") reads the live snapshot; versionAsOf and " +
    "timestampAsOf address history") {
    val root = build()
    val live = spark.read.format("cdc").option("path", root).load()
    assert(live.schema == CdcApply.readSnapshot(spark, root).get.schema)
    assert(rows(live) == Set(1L -> 11.0, 2L -> 20.0))
    val v0 = spark.read.format("cdc").option("path", root)
      .option("versionAsOf", "0").load()
    assert(rows(v0) == Set(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
    val t1500 = spark.read.format("cdc").option("path", root)
      .option("timestampAsOf", "1500").load()
    assert(rows(t1500) == Set(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
  }

  test("pruning and filters delegate into the snapshot plan; " +
    "untranslatable predicates stay correct") {
    import org.apache.spark.sql.functions._
    val root = build()
    val df = spark.read.format("cdc").option("path", root).load()
    // translated filter shapes
    assert(rows(df.filter(col("k") === 1L)) == Set(1L -> 11.0))
    assert(rows(df.filter(col("amount") > 15.0 && col("k").isNotNull))
      == Set(2L -> 20.0))
    // a shape the shim does not translate (expression filter) is
    // re-applied by Spark above the scan — correct either way
    assert(rows(df.filter(col("k") + 1 === 2L)) == Set(1L -> 11.0))
    // count(*) (zero required columns) keeps row multiplicity
    assert(df.count() == 2L)
    // column pruning yields exactly the projected schema
    assert(df.select("amount").columns.toSeq == Seq("amount"))
  }

  test("df.write.format(\"cdc\").mode(\"append\") IS an applyBatch: " +
      "merge semantics, auto/explicit batch ids, replay idempotence") {
    import spark.implicits._
    val root = newRoot()
    def write(df: org.apache.spark.sql.DataFrame,
        batch: Option[Long]): Unit = {
      val w = df.write.format("cdc").mode("append")
        .option("path", root).option("keys", "k")
        .option("versionCol", "version").option("deletedCol", "deleted")
      batch.fold(w)(b => w.option("batchId", b.toString)).save()
    }
    write(Seq((1L, 1L, 10.0, false), (2L, 1L, 20.0, false))
      .toDF("k", "version", "amount", "deleted"), None) // auto batch 0
    write(Seq((1L, 2L, 11.0, false), (2L, 2L, 20.0, true))
      .toDF("k", "version", "amount", "deleted"), Some(1L))
    val got = rows(spark.read.format("cdc").option("path", root).load())
    assert(got == Set(1L -> 11.0), got.toString)
    assert(CdcApply.currentVersion(spark, root).contains(1L))
    // explicit batch id replays through the guard: content unchanged
    write(Seq((1L, 9L, 99.0, false))
      .toDF("k", "version", "amount", "deleted"), Some(1L))
    assert(rows(spark.read.format("cdc").option("path", root).load()) ==
      Set(1L -> 11.0), "replayed batch must no-op")
    // a bare append to an EXISTING table inherits the merge contract
    // from the manifest (keys, versionCol, deletedCol, layout) — the
    // deleteWhere/updateWhere defaulting pattern
    Seq((3L, 1L, 30.0, false)).toDF("k", "version", "amount", "deleted")
      .write.format("cdc").mode("append").option("path", root).save()
    assert(rows(spark.read.format("cdc").option("path", root).load()) ==
      Set(1L -> 11.0, 3L -> 30.0))
    // ...but a NEW root has no manifest to default from: refuses
    intercept[IllegalArgumentException] {
      Seq((1L, 1L, 1.0, false)).toDF("k", "version", "amount", "deleted")
        .write.format("cdc").mode("append").option("path", newRoot())
        .save()
    }
  }

  test("non-append writes are refused; bad options fail loudly") {
    import spark.implicits._
    val root = build()
    val e = intercept[UnsupportedOperationException] {
      Seq((9L, 9L, 90.0, false))
        .toDF("k", "version", "amount", "deleted")
        .write.format("cdc").option("path", root).save() // ErrorIfExists
    }
    assert(e.getMessage.contains("append"), e.getMessage)
    val eo = intercept[UnsupportedOperationException] {
      Seq((9L, 9L, 90.0, false))
        .toDF("k", "version", "amount", "deleted")
        .write.format("cdc").mode("overwrite")
        .option("path", root).save()
    }
    assert(eo.getMessage.contains("restore/vacuum"), eo.getMessage)
    intercept[IllegalArgumentException] {
      spark.read.format("cdc").load()
    }
    intercept[IllegalArgumentException] {
      spark.read.format("cdc").option("path", root)
        .option("versionAsOf", "0").option("timestampAsOf", "1")
        .load()
    }
    val empty = newRoot()
    val e2 = intercept[IllegalStateException] {
      spark.read.format("cdc").option("path", empty).load()
    }
    assert(e2.getMessage.contains("no readable snapshot"), e2.getMessage)
  }

  test("CREATE TABLE ... USING cdc registers a CATALOG-persistent " +
      "entry point; refreshTable picks up later commits") {
    import spark.implicits._
    val root = build()
    spark.sql("DROP TABLE IF EXISTS cdc_catalog_t")
    spark.sql(s"CREATE TABLE cdc_catalog_t USING cdc " +
      s"OPTIONS (path '$root')")
    try {
      assert(rows(spark.table("cdc_catalog_t")) ==
        Set(1L -> 11.0, 2L -> 20.0))
      // the catalog caches the resolved relation — unlike the
      // registered-name surface (CdcSql expands per analysis), a
      // catalog read after a new commit needs refreshTable; this
      // pins the documented liveness contract of the catalog form
      assert(CdcApply.applyBatch(
        Seq((2L, 2L, 99.0, false)).toDF("k", "version", "amount",
          "deleted"),
        2L, root, Seq("k"), "version", Some("deleted"),
        commitTs = Some(3000L)))
      spark.catalog.refreshTable("cdc_catalog_t")
      assert(rows(spark.table("cdc_catalog_t")) ==
        Set(1L -> 11.0, 2L -> 99.0))
      // INSERT through the catalog name refuses (the relation is not
      // insertable — analyzer wording varies by Spark version; the
      // contract is refusal + untouched content)
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("INSERT INTO cdc_catalog_t VALUES " +
          "(9, 1, 9.0, false)")
      }
      assert(rows(spark.table("cdc_catalog_t")) ==
        Set(1L -> 11.0, 2L -> 99.0), "refused INSERT must not write")
    } finally spark.sql("DROP TABLE IF EXISTS cdc_catalog_t")
  }

  test("bare appends to a changelog-enabled table keep the changelog " +
      "fed, and non-default retention is inherited from the manifest") {
    import spark.implicits._
    val root = newRoot()
    assert(CdcApply.applyBatch(
      Seq((1L, 1L, 10.0, false)).toDF("k", "version", "amount",
        "deleted"),
      0L, root, Seq("k"), "version", Some("deleted"),
      tombstoneRetention = 7, changelog = true,
      commitTs = Some(1000L)))
    // no changelog/retention options: detection + manifest defaulting
    // must make this append succeed AND log its changelog entry
    Seq((2L, 1L, 20.0, false)).toDF("k", "version", "amount", "deleted")
      .write.format("cdc").mode("append").option("path", root)
      .option("commitTs", "2000").save()
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(root, "changelog/b1")),
      "changelog tail diverged: bare append skipped the changelog entry")
    assert(rows(spark.read.format("cdc").option("path", root).load()) ==
      Set(1L -> 10.0, 2L -> 20.0))
    // explicit changelog=false still overrides the detection
    Seq((3L, 1L, 30.0, false)).toDF("k", "version", "amount", "deleted")
      .write.format("cdc").mode("append").option("path", root)
      .option("changelog", "false").option("commitTs", "3000").save()
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root,
      "changelog/b2")))
  }

  test("readStream.format(\"cdc\") tails the changelog with batch-id " +
    "offsets: events per applied batch, restart resumes past the " +
    "checkpointed batch, pre-changelog tables refuse loudly") {
    import spark.implicits._
    val root = newRoot()
    def apply(rows: Seq[(Long, Long, String, Boolean)], id: Long) =
      CdcApply.applyBatch(rows.toDF("k", "version", "v", "deleted"),
        id, root, Seq("k"), "version", Some("deleted"), numBuckets = 2,
        changelog = true)
    // no table yet: schema resolution refuses with a pointed message
    val noTable = intercept[IllegalStateException] {
      spark.readStream.format("cdc").option("path", root).load()
    }
    assert(noTable.getMessage.contains("changelog-enabled"))
    assert(apply(Seq((1L, 1L, "a", false), (2L, 1L, "b", false)), 0L))
    assert(apply(Seq((2L, 2L, "b2", false), (3L, 1L, "", true)), 1L))
    // phase 1 — live tail (memory sink, no checkpoint): events arrive
    // per applied batch with the batch id as _change_batch
    val q1 = spark.readStream.format("cdc")
      .option("path", root).load()
      .writeStream.format("memory").queryName("cdc_src_sink")
      .outputMode("append").start()
    try {
      def got() = spark.table("cdc_src_sink")
        .select("k", "version", "v", "deleted", "_change_batch")
        .as[(Long, Long, String, Boolean, Long)].collect().toSet
      q1.processAllAvailable()
      assert(got() == Set(
        (1L, 1L, "a", false, 0L), (2L, 1L, "b", false, 0L),
        (2L, 2L, "b2", false, 1L), (3L, 1L, "", true, 1L)),
        got().toString)
      // a live apply lands as the next offset
      assert(apply(Seq((1L, 3L, "a3", false)), 2L))
      q1.processAllAvailable()
      assert(got().contains((1L, 3L, "a3", false, 2L)) &&
        got().size == 5)
    } finally {
      q1.stop()
      spark.sql("DROP VIEW IF EXISTS cdc_src_sink")
    }
    // phase 2 — checkpointed consumer (foreachBatch, which supports
    // recovery): the restart resumes from the checkpointed BATCH-ID
    // offset, so only batches applied while the stream was down
    // arrive in the second run — nothing replays
    val ckpt = java.nio.file.Files
      .createTempDirectory("cdc_src_ckpt").toFile.getAbsolutePath
    val seen = new scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    def startCk() = spark.readStream.format("cdc")
      .option("path", root).load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.select("k", "_change_batch").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        seen.synchronized { seen ++= rows }
        ()
      }.start()
    val q2 = startCk()
    try q2.processAllAvailable() finally q2.stop()
    assert(seen.synchronized(seen.map(_._2).toSet) == Set(0L, 1L, 2L),
      s"first checkpointed run must read batches 0-2: $seen")
    seen.synchronized(seen.clear())
    assert(apply(Seq((4L, 1L, "d", false)), 3L))
    val q3 = startCk()
    try q3.processAllAvailable() finally q3.stop()
    assert(seen.synchronized(seen.toList) == List(4L -> 3L),
      s"restart must deliver ONLY batch 3: $seen")
  }

  test("the relation reports plan-derived sizeInBytes: a tiny table " +
    "read through the format shim broadcasts in a join") {
    import spark.implicits._
    val root = build()
    val small = spark.read.format("cdc").option("path", root).load()
    val big = (0L until 50000L).map(k => (k, k % 7)).toDF("k", "v")
    val plan = big.join(small.select("k", "amount"), "k")
      .queryExecution.sparkPlan
    val bhj = plan.collect { case b: org.apache.spark.sql.execution
      .joins.BroadcastHashJoinExec => b }
    assert(bhj.nonEmpty,
      s"a 2-live-row cdc relation should broadcast, got:\n$plan")
  }

  test("the cdc sink fails LOUDLY when interleaved DML steals an " +
    "epoch's batch-id slot (silent replay-guard swallow would be " +
    "data loss)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    val root = newRoot() + "/t"
    val stream = MemoryStream[(Long, Long, Double)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("cdc_sink_guard").toFile.getAbsolutePath
    def start() = stream.toDF().toDF("k", "version", "amount")
      .writeStream.format("cdc")
      .option("path", root)
      .option("keys", "k").option("versionCol", "version")
      .option("checkpointLocation", ckpt)
      .start()
    val q = start()
    try {
      stream.addData((1L, 1L, 10.0))
      q.processAllAvailable()
      assert(CdcApply.currentVersion(spark, root).contains(0L))
      // an interleaved writer auto-commits at head+1 = 1 — the slot
      // epoch 1 would map to
      CdcApply.updateWhere(spark, root,
        org.apache.spark.sql.functions.col("k") === 1L,
        Map("amount" -> org.apache.spark.sql.functions.lit(99.0)))
      assert(CdcApply.currentVersion(spark, root).contains(1L))
      stream.addData((2L, 1L, 20.0))
      val e = intercept[org.apache.spark.sql.streaming
        .StreamingQueryException] {
        q.processAllAvailable()
      }
      def chain(t: Throwable): String =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
      assert(chain(e).contains("interleaved writer"), chain(e))
      // the epoch was NOT silently swallowed-as-applied: k=2 never
      // landed, and the failure said so
      assert(CdcApply.readSnapshot(spark, root).get
        .filter(org.apache.spark.sql.functions.col("k") === 2L)
        .isEmpty)
    } finally q.stop()
  }
}
