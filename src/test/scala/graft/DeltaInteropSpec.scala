package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.DeltaInterop
import graft.streaming.CdcApply

/** Delta-protocol interop ([[graft.sources.DeltaInterop]]): exports
  * must be structurally conformant to the PUBLIC Delta transaction-log
  * spec and round-trip through the engine's own protocol reader; the
  * reader must refuse protocol features it does not implement.
  */
class DeltaInteropSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(p: String): String = java.nio.file.Files
    .createTempDirectory(p).toFile.getAbsolutePath

  private def buildCdc(): String = {
    import spark.implicits._
    val root = tmp("delta_cdc")
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

  test("export round-trips through the protocol reader; re-export " +
      "after new CDC batches is an atomic full-rewrite commit") {
    import spark.implicits._
    val root = buildCdc()
    val delta = tmp("delta_tbl")
    assert(DeltaInterop.exportSnapshot(spark, root, delta) == 0L)
    val v0 = DeltaInterop.readDelta(spark, delta)
    assert(v0.schema == CdcApply.readSnapshot(spark, root).get.schema)
    assert(state(v0) == Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
    // CDC moves on: update k=1, tombstone k=2; the export publishes
    // version 1 whose net file set is exactly the new snapshot
    assert(CdcApply.applyBatch(
      Seq((1L, 2L, 11.0, false), (2L, 2L, 20.0, true))
        .toDF("k", "version", "amount", "deleted"),
      1L, root, Seq("k"), "version", Some("deleted"), numBuckets = 2,
      commitTs = Some(2000L)))
    assert(DeltaInterop.exportSnapshot(spark, root, delta) == 1L)
    assert(state(DeltaInterop.readDelta(spark, delta)) ==
      Map(1L -> 11.0, 3L -> 30.0))
    // delta-side reads are ordinary parquet: pushdown-able filters
    assert(state(DeltaInterop.readDelta(spark, delta)
      .filter(col("amount") > 20.0)) == Map(3L -> 30.0))
  }

  test("the log is structurally spec-conformant newline-delimited " +
      "JSON: protocol once, metaData with Spark-JSON schemaString, " +
      "relative add/remove paths") {
    val root = buildCdc()
    val delta = tmp("delta_struct")
    DeltaInterop.exportSnapshot(spark, root, delta)
    CdcApply.applyBatch(
      { import spark.implicits._
        Seq((9L, 1L, 90.0, false))
          .toDF("k", "version", "amount", "deleted") },
      1L, root, Seq("k"), "version", Some("deleted"), numBuckets = 2,
      commitTs = Some(2000L))
    DeltaInterop.exportSnapshot(spark, root, delta)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def actions(v: Long) = {
      val f = new java.io.File(delta, f"_delta_log/$v%020d.json")
      assert(f.exists, f.toString)
      scala.io.Source.fromFile(f, "UTF-8").getLines()
        .filter(_.nonEmpty).map(mapper.readTree).toSeq
    }
    val a0 = actions(0L)
    assert(a0.count(_.has("protocol")) == 1)
    val proto = a0.find(_.has("protocol")).get.get("protocol")
    assert(proto.get("minReaderVersion").asInt == 1 &&
      proto.get("minWriterVersion").asInt == 2)
    val meta = a0.find(_.has("metaData")).get.get("metaData")
    assert(meta.get("format").get("provider").asText == "parquet")
    // schemaString is Spark's StructType JSON — Delta's serialization
    val parsed = org.apache.spark.sql.types.DataType
      .fromJson(meta.get("schemaString").asText)
    assert(parsed.isInstanceOf[org.apache.spark.sql.types.StructType])
    assert(a0.count(_.has("remove")) == 0)
    val adds0 = a0.filter(_.has("add")).map(_.get("add"))
    assert(adds0.nonEmpty)
    adds0.foreach { a =>
      val p = a.get("path").asText
      assert(!p.startsWith("/") && p.endsWith(".parquet"), p)
      assert(a.get("size").asLong > 0)
      assert(a.get("dataChange").asBoolean)
    }
    // version 1: removes exactly version 0's adds, then its own adds
    val a1 = actions(1L)
    assert(a1.count(_.has("protocol")) == 0,
      "protocol action must appear only at version 0")
    val removed = a1.filter(_.has("remove"))
      .map(_.get("remove").get("path").asText).toSet
    assert(removed == adds0.map(_.get("path").asText).toSet)
  }

  test("incremental export republishes ONLY changed buckets; " +
      "no-change calls commit nothing; snapshot-lineage dirs refuse") {
    import spark.implicits._
    val root = tmp("delta_cdc_inc")
    // enough spread that one key's batch touches a strict subset of
    // the 4 buckets
    val b0 = (1L to 40L).map(k => (k, 1L, k * 1.0, false))
      .toDF("k", "version", "amount", "deleted")
    assert(CdcApply.applyBatch(b0, 0L, root, Seq("k"), "version",
      Some("deleted"), numBuckets = 4, commitTs = Some(1000L)))
    val delta = tmp("delta_inc")
    assert(DeltaInterop.exportIncremental(spark, root, delta)
      .contains(0L))
    assert(state(DeltaInterop.readDelta(spark, delta)) ==
      (1L to 40L).map(k => k -> k * 1.0).toMap)
    // immediately re-export: nothing changed, no new version
    assert(DeltaInterop.exportIncremental(spark, root, delta).isEmpty)
    // one-key update: only that key's bucket re-publishes
    assert(CdcApply.applyBatch(
      Seq((7L, 2L, 700.0, false))
        .toDF("k", "version", "amount", "deleted"),
      1L, root, Seq("k"), "version", Some("deleted"), numBuckets = 4,
      commitTs = Some(2000L)))
    assert(DeltaInterop.exportIncremental(spark, root, delta)
      .contains(1L))
    val v1Buckets = new java.io.File(delta, "v1").listFiles()
      .map(_.getName).toSet
    assert(v1Buckets.size == 1 && v1Buckets.head.startsWith("b"),
      s"expected exactly one rewritten bucket dir, got $v1Buckets")
    val expect = (1L to 40L).map(k =>
      k -> (if (k == 7L) 700.0 else k * 1.0)).toMap
    assert(state(DeltaInterop.readDelta(spark, delta)) == expect)
    // the commit removed only that bucket's prior files
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val a1 = scala.io.Source.fromFile(new java.io.File(delta,
        "_delta_log/00000000000000000001.json"), "UTF-8")
      .getLines().filter(_.nonEmpty).map(mapper.readTree).toSeq
    val removed = a1.filter(_.has("remove"))
      .map(_.get("remove").get("path").asText)
    assert(removed.nonEmpty &&
      removed.forall(_.startsWith(s"v0/${v1Buckets.head}/")),
      removed.toString)
    // a snapshot-lineage dir has no export state: refuse loudly
    val snapDir = tmp("delta_snap_lineage")
    DeltaInterop.exportSnapshot(spark, root, snapDir)
    val e = intercept[IllegalStateException] {
      DeltaInterop.exportIncremental(spark, root, snapDir)
    }
    assert(e.getMessage.contains("export state"), e.getMessage)
  }

  test("continuous export follows the changelog: each applied batch " +
      "lands in the Delta mirror") {
    import spark.implicits._
    val root = tmp("delta_cont_cdc")
    val delta = tmp("delta_cont")
    val ckpt = tmp("delta_cont_ckpt")
    val b0 = Seq((1L, 1L, 10.0, false), (2L, 1L, 20.0, false))
      .toDF("k", "version", "amount", "deleted")
    assert(CdcApply.applyBatch(b0, 0L, root, Seq("k"), "version",
      Some("deleted"), numBuckets = 2, changelog = true,
      commitTs = Some(1000L)))
    val q = DeltaInterop.startContinuousExport(spark, root, delta, ckpt)
    try {
      q.processAllAvailable()
      assert(state(DeltaInterop.readDelta(spark, delta)) ==
        Map(1L -> 10.0, 2L -> 20.0))
      assert(CdcApply.applyBatch(
        Seq((1L, 2L, 11.0, false), (3L, 1L, 30.0, false))
          .toDF("k", "version", "amount", "deleted"),
        1L, root, Seq("k"), "version", Some("deleted"), numBuckets = 2,
        changelog = true, commitTs = Some(2000L)))
      q.processAllAvailable()
      assert(state(DeltaInterop.readDelta(spark, delta)) ==
        Map(1L -> 11.0, 2L -> 20.0, 3L -> 30.0))
    } finally q.stop()
    // a table without a changelog refuses with the remedy
    val plain = tmp("delta_cont_plain")
    assert(CdcApply.applyBatch(b0, 0L, plain, Seq("k"), "version",
      Some("deleted"), commitTs = Some(1000L)))
    val e = intercept[IllegalArgumentException] {
      DeltaInterop.startContinuousExport(spark, plain,
        tmp("x"), tmp("y"))
    }
    assert(e.getMessage.contains("changelog"), e.getMessage)
  }

  test("a stale export-state stamp (crash between log commit and " +
      "state write) self-heals with a full rewrite — no duplicate " +
      "rows survive") {
    import spark.implicits._
    val root = buildCdc()
    val delta = tmp("delta_heal")
    DeltaInterop.exportIncremental(spark, root, delta)
    assert(CdcApply.applyBatch(
      Seq((1L, 2L, 11.0, false))
        .toDF("k", "version", "amount", "deleted"),
      1L, root, Seq("k"), "version", Some("deleted"), numBuckets = 2,
      commitTs = Some(2000L)))
    DeltaInterop.exportIncremental(spark, root, delta)
    val good = state(DeltaInterop.readDelta(spark, delta))
    // simulate the crash: regress the sidecar's version stamp so it
    // no longer matches the log head (delete the .crc sidecar too —
    // Hadoop's local FS checksums would otherwise reject the edit)
    val sf = new java.io.File(delta, "_graft_export_state.json")
    val text = java.nio.file.Files.readString(sf.toPath)
    new java.io.File(delta, "._graft_export_state.json.crc").delete()
    java.nio.file.Files.writeString(sf.toPath,
      text.replaceFirst("\"version\":1", "\"version\":0"))
    // next sync self-heals: a full-rewrite commit, live read unchanged
    assert(DeltaInterop.exportIncremental(spark, root, delta)
      .contains(2L))
    assert(state(DeltaInterop.readDelta(spark, delta)) == good,
      "self-heal must not duplicate or lose rows")
    // row MULTIPLICITY check too — a stale-state bug leaves old files
    // live, which doubles counts without changing the keyed state()
    assert(DeltaInterop.readDelta(spark, delta).count() ==
      good.size.toLong)
    // and the healed lineage is steady again
    assert(DeltaInterop.exportIncremental(spark, root, delta).isEmpty)
  }

  test("pre-commit crash debris (orphan data dir + tmp log file) is " +
      "swept on the next attempt, so a crashed export never wedges " +
      "the retry path") {
    import spark.implicits._
    val root = buildCdc()
    val delta = tmp("delta_debris")
    assert(DeltaInterop.exportSnapshot(spark, root, delta) == 0L)
    // simulate a crash mid-export of version 1: data dir and log tmp
    // exist, no commit — without the sweep, every retry would die on
    // errorifexists / create(overwrite=false) forever
    val v1 = new java.io.File(delta, "v1"); v1.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(v1, "part-junk.parquet").toPath, "junk")
    java.nio.file.Files.writeString(
      new java.io.File(delta, "_delta_log/.tmp-1").toPath, "{}")
    assert(CdcApply.applyBatch(
      Seq((1L, 2L, 11.0, false))
        .toDF("k", "version", "amount", "deleted"),
      1L, root, Seq("k"), "version", Some("deleted"), numBuckets = 2,
      commitTs = Some(2000L)))
    assert(DeltaInterop.exportSnapshot(spark, root, delta) == 1L)
    val s = state(DeltaInterop.readDelta(spark, delta))
    assert(s == Map(1L -> 11.0, 2L -> 20.0, 3L -> 30.0))
    assert(DeltaInterop.readDelta(spark, delta).count() == 3L)
    assert(!new java.io.File(v1, "part-junk.parquet").exists,
      "the orphaned junk file must have been swept, not committed")
    // same window on the INCREMENTAL path
    val inc = tmp("delta_debris_inc")
    assert(DeltaInterop.exportIncremental(spark, root, inc)
      .contains(0L))
    val iv1 = new java.io.File(inc, "v1"); iv1.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(iv1, "junk.parquet").toPath, "junk")
    java.nio.file.Files.writeString(
      new java.io.File(inc, "_delta_log/.tmp-1").toPath, "{}")
    assert(CdcApply.applyBatch(
      Seq((2L, 2L, 21.0, false))
        .toDF("k", "version", "amount", "deleted"),
      2L, root, Seq("k"), "version", Some("deleted"), numBuckets = 2,
      commitTs = Some(3000L)))
    assert(DeltaInterop.exportIncremental(spark, root, inc)
      .contains(1L))
    assert(state(DeltaInterop.readDelta(spark, inc)) ==
      Map(1L -> 11.0, 2L -> 21.0, 3L -> 30.0))
    assert(!new java.io.File(iv1, "junk.parquet").exists)
  }

  test("vacuumExport deletes exactly the files later commits " +
      "removed; the live read is untouched") {
    import spark.implicits._
    val root = buildCdc()
    val delta = tmp("delta_vac")
    DeltaInterop.exportIncremental(spark, root, delta)
    assert(CdcApply.applyBatch(
      Seq((1L, 2L, 11.0, false))
        .toDF("k", "version", "amount", "deleted"),
      1L, root, Seq("k"), "version", Some("deleted"), numBuckets = 2,
      commitTs = Some(2000L)))
    DeltaInterop.exportIncremental(spark, root, delta)
    val before = state(DeltaInterop.readDelta(spark, delta))
    val dead = DeltaInterop.vacuumExport(spark, delta)
    assert(dead.nonEmpty && dead.forall(_.startsWith("v0/")),
      dead.toString)
    dead.foreach(p => assert(!new java.io.File(delta, p).exists))
    assert(state(DeltaInterop.readDelta(spark, delta)) == before,
      "vacuum must not change the live read")
    // idempotent: nothing left to sweep
    assert(DeltaInterop.vacuumExport(spark, delta).isEmpty)
    // an IN-FLIGHT export's uncommitted data (v-dir above the log
    // head) is NOT vacuum's to delete — sweeping it would let the
    // concurrent commit reference missing files
    val inflight = new java.io.File(delta, "v9"); inflight.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(inflight, "pending.parquet").toPath, "x")
    assert(DeltaInterop.vacuumExport(spark, delta).isEmpty)
    assert(new java.io.File(inflight, "pending.parquet").exists,
      "vacuum must skip versions above the committed log head")
  }

  test("format(\"delta\") reads the export through the " +
      "DataFrameReader protocol; writes are refused by construction") {
    val root = buildCdc()
    val delta = tmp("delta_fmt")
    DeltaInterop.exportSnapshot(spark, root, delta)
    val df = spark.read.format("delta").option("path", delta).load()
    assert(state(df) == Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
    assert(state(df.filter(col("amount") > 15.0)) ==
      Map(2L -> 20.0, 3L -> 30.0))
    // read-only shim: a save has no protocol-commit semantics here
    intercept[Exception] {
      df.write.format("delta").option("path", tmp("delta_fmt_w"))
        .save()
    }
  }

  test("unsupported reader versions refuse loudly; a foreign " +
      "protocol-1 log reads fine") {
    import java.nio.file.{Files, Paths}
    val delta = tmp("delta_foreign")
    // hand-author a minimal foreign log over one parquet file
    val spark2 = spark
    import spark2.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .coalesce(1).write.parquet(s"$delta/files")
    val part = new java.io.File(s"$delta/files").listFiles()
      .map(_.getName).find(_.endsWith(".parquet")).get
    val schema = Seq((1L, "a")).toDF("id", "s").schema.json
      .replace("\"", "\\\"")
    Files.createDirectories(Paths.get(s"$delta/_delta_log"))
    Files.writeString(Paths.get(
      s"$delta/_delta_log/00000000000000000000.json"),
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
{"metaData":{"id":"x","schemaString":"$schema","format":{"provider":"parquet","options":{}},"partitionColumns":[],"configuration":{}}}
{"add":{"path":"files/$part","size":1,"partitionValues":{},"modificationTime":0,"dataChange":true}}
""")
    val got = DeltaInterop.readDelta(spark, delta).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set(1L -> "a", 2L -> "b"))
    // a version-3 reader FEATURE this engine lacks (timestampNtz)
    // refuses loudly; reader versions beyond 3 refuse too
    Files.writeString(Paths.get(
      s"$delta/_delta_log/00000000000000000001.json"),
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["timestampNtz"]}}
""")
    val e = intercept[UnsupportedOperationException] {
      DeltaInterop.readDelta(spark, delta)
    }
    assert(e.getMessage.contains("timestampNtz"), e.getMessage)
    Files.writeString(Paths.get(
      s"$delta/_delta_log/00000000000000000001.json"),
      """{"protocol":{"minReaderVersion":4,"minWriterVersion":7}}
""")
    new java.io.File(delta,
      "_delta_log/.00000000000000000001.json.crc").delete()
    val e2 = intercept[UnsupportedOperationException] {
      DeltaInterop.readDelta(spark, delta)
    }
    assert(e2.getMessage.contains("reader version 4"), e2.getMessage)
  }

  test("column mapping (reader v2/v3): NAME mode resolves physical " +
      "file columns to logical names; ID mode resolves by parquet " +
      "field id; a partitioned mapped table resolves partitionValues " +
      "by PHYSICAL key") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.types._
    def schemaJson(fields: Seq[(String, String, Map[String, Any])])
        : String = {
      // hand-build the Delta schemaString with columnMapping metadata
      val fs = fields.map { case (name, tpe, md) =>
        val mdJson = md.map {
          case (k, v: String) => s""""$k":"$v""""
          case (k, v) => s""""$k":$v"""
        }.mkString(",")
        s"""{"name":"$name","type":"$tpe","nullable":true,""" +
          s""""metadata":{$mdJson}}"""
      }.mkString(",")
      s"""{"type":"struct","fields":[$fs]}"""
        .replace("\\", "\\\\").replace("\"", "\\\"")
    }
    def writeLog(dir: String, schema: String, part: String,
        mode: String, protocol: String,
        partCols: String = "[]",
        partValues: String = "{}"): Unit = {
      Files.createDirectories(Paths.get(s"$dir/_delta_log"))
      Files.writeString(Paths.get(
        s"$dir/_delta_log/00000000000000000000.json"),
        s"""$protocol
{"metaData":{"id":"x","schemaString":"$schema","format":{"provider":"parquet","options":{}},"partitionColumns":$partCols,"configuration":{"delta.columnMapping.mode":"$mode"}}}
{"add":{"path":"files/$part","size":1,"partitionValues":$partValues,"modificationTime":0,"dataChange":true}}
""")
    }
    // ---- NAME mode: file stores col-aaa/col-bbb, logical id/s ----
    val d1 = tmp("delta_cm_name")
    val spark2 = spark
    import spark2.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("col-aaa", "col-bbb")
      .coalesce(1).write.parquet(s"$d1/files")
    val p1 = new java.io.File(s"$d1/files").listFiles()
      .map(_.getName).find(_.endsWith(".parquet")).get
    writeLog(d1, schemaJson(Seq(
      ("id", "long", Map("delta.columnMapping.physicalName" -> "col-aaa",
        "delta.columnMapping.id" -> 1)),
      ("s", "string", Map("delta.columnMapping.physicalName" -> "col-bbb",
        "delta.columnMapping.id" -> 2)))), p1, "name",
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""")
    val got1 = DeltaInterop.readDelta(spark, d1)
    assert(got1.columns.toSeq == Seq("id", "s"))
    assert(got1.collect().map(r => (r.getLong(0), r.getString(1)))
      .toSet == Set(1L -> "a", 2L -> "b"))
    // ---- ID mode (protocol v3 + columnMapping feature): physical
    // names differ AND resolution rides parquet field ids ----
    val d2 = tmp("delta_cm_id")
    val fileSchema = StructType(Seq(
      StructField("col-xxx", LongType, nullable = true,
        new MetadataBuilder().putLong("parquet.field.id", 1L).build()),
      StructField("col-yyy", StringType, nullable = true,
        new MetadataBuilder().putLong("parquet.field.id", 2L).build())))
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, "a"),
        org.apache.spark.sql.Row(2L, "b")), 1), fileSchema)
      .write.parquet(s"$d2/files")
    val p2 = new java.io.File(s"$d2/files").listFiles()
      .map(_.getName).find(_.endsWith(".parquet")).get
    writeLog(d2, schemaJson(Seq(
      ("id", "long", Map("delta.columnMapping.physicalName" -> "col-xxx",
        "delta.columnMapping.id" -> 1)),
      ("s", "string", Map("delta.columnMapping.physicalName" -> "col-yyy",
        "delta.columnMapping.id" -> 2)))), p2, "id",
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["columnMapping"]}}""")
    val got2 = DeltaInterop.readDelta(spark, d2)
    assert(got2.columns.toSeq == Seq("id", "s"))
    assert(got2.collect().map(r => (r.getLong(0), r.getString(1)))
      .toSet == Set(1L -> "a", 2L -> "b"))
    // ---- partitioned + column mapping: the data file stores ONLY
    // the physical data column; the partition value rides the add
    // action KEYED BY THE PHYSICAL NAME (what mapped writers emit)
    val d3 = tmp("delta_cm_part")
    Seq(Tuple1(1L), Tuple1(2L)).toDF("col-aaa")
      .coalesce(1).write.parquet(s"$d3/files")
    val p3 = new java.io.File(s"$d3/files").listFiles()
      .map(_.getName).find(_.endsWith(".parquet")).get
    writeLog(d3, schemaJson(Seq(
      ("id", "long", Map("delta.columnMapping.physicalName" -> "col-aaa",
        "delta.columnMapping.id" -> 1)),
      ("p", "string", Map(
        "delta.columnMapping.physicalName" -> "col-ppp",
        "delta.columnMapping.id" -> 2)))), p3, "name",
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      partCols = """["p"]""",
      partValues = """{"col-ppp":"emea"}""")
    val got3 = DeltaInterop.readDelta(spark, d3)
    assert(got3.columns.toSeq == Seq("id", "p"))
    assert(got3.collect().map(r => (r.getLong(0), r.getString(1)))
      .toSet == Set(1L -> "emea", 2L -> "emea"))
  }

  test("partitioned foreign Delta tables read: partition columns " +
      "reconstructed from add.partitionValues as typed literals, " +
      "NULL partitions honored, partition predicates prune whole " +
      "file groups out of the physical plan") {
    import java.nio.file.{Files, Paths}
    val spark2 = spark
    import spark2.implicits._
    val delta = tmp("delta_part")
    // three hive-partitioned file groups over (p int, d date); the
    // data files OMIT the partition columns — the real-world shape
    def writeGroup(sub: String, rows: Seq[(Long, String)]): String = {
      rows.toDF("id", "s").coalesce(1).write.parquet(s"$delta/$sub")
      val f = new java.io.File(s"$delta/$sub").listFiles()
        .map(_.getName).find(_.endsWith(".parquet")).get
      s"$sub/$f"
    }
    val f1 = writeGroup("p=1/d=2024-01-01",
      Seq((1L, "a"), (2L, "b")))
    val f2 = writeGroup("p=2/d=2024-01-02", Seq((3L, "c")))
    val f3 = writeGroup("p=null", Seq((4L, "d")))
    val schema = Seq((1L, "a", 1, java.sql.Date.valueOf("2024-01-01")))
      .toDF("id", "s", "p", "d").schema.json
      .replace("\\", "\\\\").replace("\"", "\\\"")
    Files.createDirectories(Paths.get(s"$delta/_delta_log"))
    Files.writeString(Paths.get(
      s"$delta/_delta_log/00000000000000000000.json"),
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
{"metaData":{"id":"x","schemaString":"$schema","format":{"provider":"parquet","options":{}},"partitionColumns":["p","d"],"configuration":{}}}
{"add":{"path":"$f1","size":1,"partitionValues":{"p":"1","d":"2024-01-01"},"modificationTime":0,"dataChange":true}}
{"add":{"path":"$f2","size":1,"partitionValues":{"p":"2","d":"2024-01-02"},"modificationTime":0,"dataChange":true}}
{"add":{"path":"$f3","size":1,"partitionValues":{"p":null,"d":null},"modificationTime":0,"dataChange":true}}
""")
    val df = DeltaInterop.readDelta(spark, delta)
    // declared column order, declared types (int + date partitions)
    assert(df.columns.toSeq == Seq("id", "s", "p", "d"))
    assert(df.schema("p").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(df.schema("d").dataType ==
      org.apache.spark.sql.types.DateType)
    val got = df.collect().map(r => (r.getLong(0), r.getString(1),
      Option(r.get(2)), Option(r.get(3)).map(_.toString))).toSet
    assert(got == Set(
      (1L, "a", Some(1), Some("2024-01-01")),
      (2L, "b", Some(1), Some("2024-01-01")),
      (3L, "c", Some(2), Some("2024-01-02")),
      (4L, "d", None, None)), got.toString)
    // PRUNING: partition literals constant-fold under the filter and
    // Catalyst drops non-matching groups — the physical plan scans a
    // strict subset of the live files
    val all = df.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.toPartitionArray
          .map(_.filePath.toString).toSeq
    }.flatten.toSet
    assert(all.size == 3, all.toString)
    val pruned = df.filter(col("p") === 1)
    assert(pruned.collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    val scanned = pruned.queryExecution.executedPlan.collectLeaves()
      .collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.toPartitionArray
            .map(_.filePath.toString).toSeq
      }.flatten.toSet
    assert(scanned.size == 1 && scanned.forall(_.contains("p=1")),
      s"partition predicate did not prune file groups: $scanned")
    // IS NULL selects exactly the null-partition group
    assert(DeltaInterop.readDelta(spark, delta)
      .filter(col("p").isNull).collect().map(_.getLong(0)).toSet ==
      Set(4L))
    // MANY-partition fallback: past 128 distinct tuples the reader
    // trades per-group literal branches (a plan explosion at 10^5
    // partitions) for ONE scan + a broadcast (file -> values) join —
    // values and types identical, plan stays O(1) nodes
    val big = tmp("delta_many_parts")
    (0 until 140).map(i => (i.toLong, s"v$i", i))
      .toDF("id", "s", "p")
      .repartition(140, col("p"))
      .write.partitionBy("p").parquet(s"$big/files")
    val adds = new java.io.File(s"$big/files").listFiles()
      .filter(_.getName.startsWith("p=")).flatMap { d =>
        val p = d.getName.stripPrefix("p=")
        d.listFiles().filter(_.getName.endsWith(".parquet")).map { f =>
          s"""{"add":{"path":"files/p=$p/${f.getName}","size":1,"partitionValues":{"p":"$p"},"modificationTime":0,"dataChange":true}}"""
        }
      }
    val bigSchema = Seq((1L, "a", 1)).toDF("id", "s", "p").schema.json
      .replace("\\", "\\\\").replace("\"", "\\\"")
    Files.createDirectories(Paths.get(s"$big/_delta_log"))
    Files.writeString(Paths.get(
      s"$big/_delta_log/00000000000000000000.json"),
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
{"metaData":{"id":"x","schemaString":"$bigSchema","format":{"provider":"parquet","options":{}},"partitionColumns":["p"],"configuration":{}}}
""" + adds.mkString("\n") + "\n")
    val bigDf = DeltaInterop.readDelta(spark, big)
    assert(bigDf.schema("p").dataType ==
      org.apache.spark.sql.types.IntegerType)
    val bigGot = bigDf.collect()
      .map(r => (r.getLong(0), r.getInt(2))).toSet
    assert(bigGot == (0 until 140).map(i => (i.toLong, i)).toSet)
    // the join fallback is adaptive (broadcast join), so inspect the
    // post-execution plan string: exactly ONE parquet scan, no
    // 140-branch union
    val planStr = bigDf.queryExecution.executedPlan.toString
    // AQE prints the scan once in the final and once in the initial
    // plan section — 2 occurrences for ONE physical scan; 140
    // branches would print hundreds
    val nScans = "Scan parquet".r.findAllIn(planStr).size
    assert(nScans <= 2,
      s"many-partition read must be ONE scan + join, got $nScans:\n" +
        planStr.take(2000))
    assert(!planStr.contains("Union"),
      "many-partition read must not union per-partition branches")

    // a missing partition value in an add action is a protocol
    // violation — refuse loudly, never NULL-fill silently
    Files.writeString(Paths.get(
      s"$delta/_delta_log/00000000000000000001.json"),
      s"""{"add":{"path":"$f1","size":1,"partitionValues":{"p":"1"},"modificationTime":0,"dataChange":true}}
""")
    val e = intercept[IllegalStateException] {
      DeltaInterop.readDelta(spark, delta).collect()
    }
    assert(e.getMessage.contains("no partition value"), e.getMessage)
  }

  test("versionAsOf time travel: any retained log version " +
      "reconstructs; versions past the head or behind a cleaned-up " +
      "checkpoint refuse") {
    import spark.implicits._
    val root = buildCdc()
    val delta = tmp("delta_tt")
    assert(DeltaInterop.exportSnapshot(spark, root, delta) == 0L)
    assert(CdcApply.applyBatch(
      Seq((1L, 2L, 11.0, false), (2L, 2L, 20.0, true))
        .toDF("k", "version", "amount", "deleted"),
      1L, root, Seq("k"), "version", Some("deleted"), numBuckets = 2,
      commitTs = Some(2000L)))
    assert(DeltaInterop.exportSnapshot(spark, root, delta) == 1L)
    assert(state(DeltaInterop.readDelta(spark, delta)) ==
      Map(1L -> 11.0, 3L -> 30.0))
    assert(state(DeltaInterop.readDelta(spark, delta, Some(0L))) ==
      Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
    assert(state(DeltaInterop.readDelta(spark, delta, Some(1L))) ==
      Map(1L -> 11.0, 3L -> 30.0))
    // the shim exposes the same axis
    assert(state(spark.read.format("graft-delta").option("path", delta)
      .option("versionAsOf", "0").load()) ==
      Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
    val e = intercept[IllegalArgumentException] {
      DeltaInterop.readDelta(spark, delta, Some(7L))
    }
    assert(e.getMessage.contains("not available"), e.getMessage)
  }

  test("metadata-level file pruning on a where predicate: add-action " +
      "STATS intervals and partition values cut the file list before " +
      "any scan; results equal filter-after-read") {
    import java.nio.file.{Files, Paths}
    val spark2 = spark
    import spark2.implicits._
    val delta = tmp("delta_stats")
    def writeGroup(sub: String, rows: Seq[(Long, String)]): String = {
      rows.toDF("id", "s").coalesce(1).write.parquet(s"$delta/$sub")
      val f = new java.io.File(s"$delta/$sub").listFiles()
        .map(_.getName).find(_.endsWith(".parquet")).get
      s"$sub/$f"
    }
    val f1 = writeGroup("a", Seq((1L, "a"), (5L, "b")))
    val f2 = writeGroup("b", Seq((10L, "c"), (20L, "d")))
    val f3 = writeGroup("c", Seq((30L, "e")))
    val schema = Seq((1L, "a")).toDF("id", "s").schema.json
      .replace("\\", "\\\\").replace("\"", "\\\"")
    def add(p: String, mn: Long, mx: Long, n: Long): String =
      s"""{"add":{"path":"$p","size":1,"partitionValues":{},"modificationTime":0,"dataChange":true,"stats":"{\\"numRecords\\":$n,\\"minValues\\":{\\"id\\":$mn},\\"maxValues\\":{\\"id\\":$mx},\\"nullCount\\":{\\"id\\":0}}"}}"""
    Files.createDirectories(Paths.get(s"$delta/_delta_log"))
    Files.writeString(Paths.get(
      s"$delta/_delta_log/00000000000000000000.json"),
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
{"metaData":{"id":"x","schemaString":"$schema","format":{"provider":"parquet","options":{}},"partitionColumns":[],"configuration":{}}}
${add(f1, 1, 5, 2)}
${add(f2, 10, 20, 2)}
${add(f3, 30, 30, 1)}
""")
    def scanned(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.queryExecution.executedPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.toPartitionArray
            .map(_.filePath.toString).toSeq
      }.flatten.toSet
    val all = DeltaInterop.readDelta(spark, delta)
    assert(scanned(all).size == 3)
    // range predicate: only the [10,20] file can match
    val mid = DeltaInterop.readDelta(spark, delta,
      where = Some("id >= 10 AND id < 25"))
    assert(mid.select("id").collect().map(_.getLong(0)).toSet ==
      Set(10L, 20L))
    val sMid = scanned(mid)
    assert(sMid.size == 1 && sMid.forall(_.contains("/b/")),
      s"stats pruning failed: $sMid")
    // equality: exactly the covering interval survives
    val eq = DeltaInterop.readDelta(spark, delta, where = Some("id = 30"))
    assert(eq.select("id").collect().map(_.getLong(0)).toSet ==
      Set(30L))
    assert(scanned(eq).forall(_.contains("/c/")))
    // a predicate over a column WITHOUT usable shape keeps all files
    // but still filters rows
    val like = DeltaInterop.readDelta(spark, delta,
      where = Some("s LIKE 'c%'"))
    assert(like.select("id").collect().map(_.getLong(0)).toSet ==
      Set(10L))
    assert(scanned(like).size == 3)
    // the shim: option("filter", ...) drives the same pruning
    val viaShim = spark.read.format("graft-delta").option("path", delta)
      .option("filter", "id >= 10 AND id < 25").load()
    assert(viaShim.select("id").collect().map(_.getLong(0)).toSet ==
      Set(10L, 20L))
  }

  test("classic parquet CHECKPOINTS: an aged log whose checkpointed " +
      "JSON commits were cleaned up reads from the checkpoint + the " +
      "JSON tail; checkpoint-only logs read; a gap with no covering " +
      "checkpoint refuses as truncated") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val spark2 = spark
    import spark2.implicits._
    def writeFile(dir: String, sub: String,
        rows: Seq[(Long, String)]): String = {
      rows.toDF("id", "s").coalesce(1).write.parquet(s"$dir/$sub")
      val f = new java.io.File(s"$dir/$sub").listFiles()
        .map(_.getName).find(_.endsWith(".parquet")).get
      s"$sub/$f"
    }
    val schemaStr = Seq((1L, "a")).toDF("id", "s").schema.json
    // the checkpoint action schema (classic): one row per action
    val cpSchema = StructType(Seq(
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType),
        StructField("minWriterVersion", IntegerType)))),
      StructField("metaData", StructType(Seq(
        StructField("id", StringType),
        StructField("schemaString", StringType),
        StructField("partitionColumns", ArrayType(StringType)),
        StructField("configuration",
          MapType(StringType, StringType))))),
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues",
          MapType(StringType, StringType)),
        StructField("size", LongType))))))
    def writeCheckpoint(dir: String, name: String,
        adds: Seq[String]): Unit = {
      val rows = Seq(
        Row(Row(1, 2), null, null),
        Row(null, Row("x", schemaStr, Seq.empty[String],
          Map.empty[String, String]), null)) ++
        adds.map(p => Row(null, null,
          Row(p, Map.empty[String, String], 1L)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), cpSchema)
        .coalesce(1).write.parquet(s"$dir/_cp_tmp")
      val part = new java.io.File(s"$dir/_cp_tmp").listFiles()
        .map(_.getName).find(_.endsWith(".parquet")).get
      Files.createDirectories(Paths.get(s"$dir/_delta_log"))
      Files.copy(Paths.get(s"$dir/_cp_tmp/$part"),
        Paths.get(s"$dir/_delta_log/$name"))
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(s"$dir/_cp_tmp"))
    }
    // ---- checkpoint at v1 (covers cleaned-up JSONs 0-1) + JSON v2 --
    val d1 = tmp("delta_cp")
    val fA = writeFile(d1, "a", Seq((1L, "a"), (2L, "b")))
    val fB = writeFile(d1, "b", Seq((3L, "c")))
    writeCheckpoint(d1, f"${1L}%020d.checkpoint.parquet", Seq(fA))
    Files.writeString(Paths.get(
      s"$d1/_delta_log/00000000000000000002.json"),
      s"""{"add":{"path":"$fB","size":1,"partitionValues":{},"modificationTime":0,"dataChange":true}}
""")
    assert(DeltaInterop.readDelta(spark, d1).select("id").collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    // ---- checkpoint-only log (every JSON cleaned up) ----
    val d2 = tmp("delta_cp_only")
    val f2 = writeFile(d2, "a", Seq((7L, "x")))
    writeCheckpoint(d2, f"${3L}%020d.checkpoint.parquet", Seq(f2))
    assert(DeltaInterop.readDelta(spark, d2).select("id").collect()
      .map(_.getLong(0)).toSet == Set(7L))
    // ---- MULTI-PART checkpoint: adds split across two parts ----
    val d3 = tmp("delta_cp_parts")
    val f3a = writeFile(d3, "a", Seq((10L, "x")))
    val f3b = writeFile(d3, "b", Seq((11L, "y")))
    writeCheckpoint(d3,
      f"${5L}%020d.checkpoint.${1}%010d.${2}%010d.parquet", Seq(f3a))
    writeCheckpoint(d3,
      f"${5L}%020d.checkpoint.${2}%010d.${2}%010d.parquet", Seq(f3b))
    assert(DeltaInterop.readDelta(spark, d3).select("id").collect()
      .map(_.getLong(0)).toSet == Set(10L, 11L))
    // an INCOMPLETE multi-part checkpoint (one part missing) is not
    // usable — with no JSONs either, the log refuses as truncated
    val d4 = tmp("delta_cp_torn")
    val f4 = writeFile(d4, "a", Seq((1L, "x")))
    writeCheckpoint(d4,
      f"${5L}%020d.checkpoint.${1}%010d.${2}%010d.parquet", Seq(f4))
    Files.writeString(Paths.get(
      s"$d4/_delta_log/00000000000000000006.json"),
      s"""{"metaData":{"id":"x","schemaString":"${schemaStr
        .replace("\\", "\\\\").replace("\"", "\\\"")}","format":{"provider":"parquet","options":{}},"partitionColumns":[],"configuration":{}}}
""")
    val e4 = intercept[IllegalStateException] {
      DeltaInterop.readDelta(spark, d4)
    }
    assert(e4.getMessage.contains("truncated"), e4.getMessage)
    // ---- a GAP in the JSON sequence with no checkpoint refuses ----
    val d5 = tmp("delta_gap")
    val f5 = writeFile(d5, "a", Seq((1L, "x")))
    Files.createDirectories(Paths.get(s"$d5/_delta_log"))
    val meta5 =
      s"""{"metaData":{"id":"x","schemaString":"${schemaStr
        .replace("\\", "\\\\").replace("\"", "\\\"")}","format":{"provider":"parquet","options":{}},"partitionColumns":[],"configuration":{}}}"""
    Files.writeString(Paths.get(
      s"$d5/_delta_log/00000000000000000000.json"),
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
$meta5
{"add":{"path":"$f5","size":1,"partitionValues":{},"modificationTime":0,"dataChange":true}}
""")
    Files.writeString(Paths.get(
      s"$d5/_delta_log/00000000000000000002.json"),
      s"""{"add":{"path":"$f5","size":1,"partitionValues":{},"modificationTime":0,"dataChange":true}}
""")
    val e5 = intercept[IllegalStateException] {
      DeltaInterop.readDelta(spark, d5)
    }
    assert(e5.getMessage.contains("missing commit files") &&
      e5.getMessage.contains("1"), e5.getMessage)
  }

  test("checkpointLog WRITES a classic checkpoint of the head state " +
      "(+ _last_checkpoint): reads base on it, truncation deletes " +
      "the covered JSONs and reads still serve; version travel " +
      "behind the truncated range refuses; DVs and partition values " +
      "survive the round-trip") {
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    val root = buildCdc()
    val delta = tmp("delta_cpw")
    assert(DeltaInterop.exportSnapshot(spark, root, delta) == 0L)
    assert(CdcApply.applyBatch(
      Seq((1L, 2L, 11.0, false), (2L, 2L, 20.0, true))
        .toDF("k", "version", "amount", "deleted"),
      1L, root, Seq("k"), "version", Some("deleted"), numBuckets = 2,
      commitTs = Some(2000L)))
    assert(DeltaInterop.exportSnapshot(spark, root, delta) == 1L)
    assert(DeltaInterop.checkpointLog(spark, delta) == 1L)
    assert(new java.io.File(delta,
      "_delta_log/00000000000000000001.checkpoint.parquet").exists())
    assert(new java.io.File(delta, "_delta_log/_last_checkpoint")
      .exists())
    assert(state(DeltaInterop.readDelta(spark, delta)) ==
      Map(1L -> 11.0, 3L -> 30.0))
    // truncate — via the SQL procedure: the covered JSONs go; reads
    // still serve the state
    val sqlRow = spark.sql(
      s"SELECT * FROM delta_checkpoint('$delta', 'true')").collect()
    assert(sqlRow.length == 1 &&
      sqlRow.head.getAs[Long]("checkpointed_version") == 1L)
    assert(!new java.io.File(delta,
      "_delta_log/00000000000000000000.json").exists())
    assert(!new java.io.File(delta,
      "_delta_log/00000000000000000001.json").exists())
    assert(state(DeltaInterop.readDelta(spark, delta)) ==
      Map(1L -> 11.0, 3L -> 30.0))
    // the checkpoint is the floor: v1 reads, v0 refuses
    assert(state(DeltaInterop.readDelta(spark, delta, Some(1L))) ==
      Map(1L -> 11.0, 3L -> 30.0))
    val e = intercept[IllegalStateException] {
      DeltaInterop.readDelta(spark, delta, Some(0L))
    }
    assert(e.getMessage.contains("not reconstructable"), e.getMessage)
    // a LATER commit replays on top of the checkpoint
    assert(CdcApply.applyBatch(
      Seq((4L, 3L, 40.0, false)).toDF("k", "version", "amount",
        "deleted"),
      2L, root, Seq("k"), "version", Some("deleted"), numBuckets = 2,
      commitTs = Some(3000L)))
    assert(DeltaInterop.exportSnapshot(spark, root, delta) == 2L)
    assert(state(DeltaInterop.readDelta(spark, delta)) ==
      Map(1L -> 11.0, 3L -> 30.0, 4L -> 40.0))
    // ---- DV + partition round-trip through a WRITTEN checkpoint ----
    val dir2 = tmp("delta_cpw_dv")
    def writePart(sub: String, rows: Seq[(Long, String)]): String = {
      rows.toDF("id", "s").coalesce(1).write.parquet(s"$dir2/$sub")
      val f = new java.io.File(s"$dir2/$sub").listFiles()
        .map(_.getName).find(_.endsWith(".parquet")).get
      s"$sub/$f"
    }
    val fA = writePart("region=A", Seq((0L, "a"), (1L, "b")))
    val fB = writePart("region=B", Seq((2L, "c")))
    val schema2 = Seq((1L, "a", "x")).toDF("id", "s", "region")
      .schema.json.replace("\\", "\\\\").replace("\"", "\\\"")
    val pl = graft.sources.DeletionVectors.encodePayload(Seq(0L))
    val plPad = java.util.Arrays.copyOf(pl, ((pl.length + 3) / 4) * 4)
    val z = graft.sources.DeletionVectors.z85Encode(plPad)
    Files.createDirectories(Paths.get(s"$dir2/_delta_log"))
    Files.writeString(Paths.get(
      s"$dir2/_delta_log/00000000000000000000.json"),
      s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"]}}
{"metaData":{"id":"x","schemaString":"$schema2","format":{"provider":"parquet","options":{}},"partitionColumns":["region"],"configuration":{}}}
{"add":{"path":"$fA","size":1,"partitionValues":{"region":"A"},"modificationTime":0,"dataChange":true,"deletionVector":{"storageType":"i","pathOrInlineDv":"$z","sizeInBytes":${pl.length},"cardinality":1}}}
{"add":{"path":"$fB","size":1,"partitionValues":{"region":"B"},"modificationTime":0,"dataChange":true}}
""")
    def got2() = DeltaInterop.readDelta(spark, dir2)
      .select("id", "region").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSet
    assert(got2() == Set(1L -> "A", 2L -> "B")) // row 0 DV-deleted
    assert(DeltaInterop.checkpointLog(spark, dir2,
      truncate = true) == 0L)
    assert(!new java.io.File(dir2,
      "_delta_log/00000000000000000000.json").exists())
    assert(got2() == Set(1L -> "A", 2L -> "B"),
      "DV/partition state lost through the written checkpoint")
  }

  test("INCREMENTAL export stays incremental across a truncating " +
      "checkpoint: the stamped state matches the checkpoint head, so " +
      "a no-change sync commits nothing and a changed sync " +
      "republishes normally") {
    import spark.implicits._
    val root = buildCdc()
    val delta = tmp("delta_cpw_inc")
    assert(DeltaInterop.exportIncremental(spark, root, delta)
      .contains(0L))
    assert(DeltaInterop.checkpointLog(spark, delta,
      truncate = true) == 0L)
    // no CDC movement: the sync must still recognize its own state
    assert(DeltaInterop.exportIncremental(spark, root, delta).isEmpty)
    // CDC moves: the next sync commits version 1 on top of the
    // checkpoint and the read serves the merged state
    assert(CdcApply.applyBatch(
      Seq((1L, 2L, 11.0, false)).toDF("k", "version", "amount",
        "deleted"),
      1L, root, Seq("k"), "version", Some("deleted"), numBuckets = 2,
      commitTs = Some(2000L)))
    assert(DeltaInterop.exportIncremental(spark, root, delta)
      .contains(1L))
    assert(state(DeltaInterop.readDelta(spark, delta)) ==
      Map(1L -> 11.0, 2L -> 20.0, 3L -> 30.0))
  }

  test("V2 CHECKPOINTS (Delta 3.x v2Checkpoint feature): a UUID-named " +
      "top-level file (parquet or json) + _sidecars parquet files " +
      "reads like a classic checkpoint; a missing sidecar or a " +
      "checkpointMetadata version mismatch refuses loudly") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val spark2 = spark
    import spark2.implicits._
    def writeFile(dir: String, sub: String,
        rows: Seq[(Long, String)]): String = {
      rows.toDF("id", "s").coalesce(1).write.parquet(s"$dir/$sub")
      val f = new java.io.File(s"$dir/$sub").listFiles()
        .map(_.getName).find(_.endsWith(".parquet")).get
      s"$sub/$f"
    }
    val schemaStr = Seq((1L, "a")).toDF("id", "s").schema.json
    val topSchema = StructType(Seq(
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType),
        StructField("minWriterVersion", IntegerType),
        StructField("readerFeatures", ArrayType(StringType))))),
      StructField("metaData", StructType(Seq(
        StructField("id", StringType),
        StructField("schemaString", StringType),
        StructField("partitionColumns", ArrayType(StringType)),
        StructField("configuration",
          MapType(StringType, StringType))))),
      StructField("checkpointMetadata", StructType(Seq(
        StructField("version", LongType)))),
      StructField("sidecar", StructType(Seq(
        StructField("path", StringType),
        StructField("sizeInBytes", LongType))))))
    val sidecarSchema = StructType(Seq(
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues",
          MapType(StringType, StringType)),
        StructField("size", LongType))))))
    def writeParquetAs(dir: String, rows: Seq[Row],
        schema: StructType, dest: String): Unit = {
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
        .coalesce(1).write.parquet(s"$dir/_cp_tmp")
      val part = new java.io.File(s"$dir/_cp_tmp").listFiles()
        .map(_.getName).find(_.endsWith(".parquet")).get
      Files.createDirectories(Paths.get(s"$dir/$dest").getParent)
      Files.copy(Paths.get(s"$dir/_cp_tmp/$part"),
        Paths.get(s"$dir/$dest"))
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(s"$dir/_cp_tmp"))
    }
    def topRows(version: Long, sidecars: Seq[String]): Seq[Row] =
      Seq(
        Row(Row(3, 7, Seq("v2Checkpoint")), null, null, null),
        Row(null, Row("x", schemaStr, Seq.empty[String],
          Map.empty[String, String]), null, null),
        Row(null, null, Row(version), null)) ++
        sidecars.map(n => Row(null, null, null, Row(n, 1L)))
    // ---- parquet top-level + two sidecars + a JSON tail commit ----
    val d1 = tmp("delta_v2cp")
    val fA = writeFile(d1, "a", Seq((1L, "a")))
    val fB = writeFile(d1, "b", Seq((2L, "b")))
    val fC = writeFile(d1, "c", Seq((3L, "c")))
    writeParquetAs(d1, Seq(Row(Row(fA, Map.empty[String, String], 1L))),
      sidecarSchema, "_delta_log/_sidecars/sc-1.parquet")
    writeParquetAs(d1, Seq(Row(Row(fB, Map.empty[String, String], 1L))),
      sidecarSchema, "_delta_log/_sidecars/sc-2.parquet")
    writeParquetAs(d1, topRows(5L, Seq("sc-1.parquet", "sc-2.parquet")),
      topSchema, "_delta_log/" +
        f"${5L}%020d.checkpoint.80a083e8-7026.parquet")
    Files.writeString(Paths.get(
      s"$d1/_delta_log/00000000000000000006.json"),
      s"""{"add":{"path":"$fC","size":1,"partitionValues":{},"modificationTime":0,"dataChange":true}}
""")
    assert(DeltaInterop.readDelta(spark, d1).select("id").collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    // ---- JSON top-level with INLINE adds, checkpoint-only log ----
    val d2 = tmp("delta_v2cp_json")
    val f2 = writeFile(d2, "a", Seq((7L, "x")))
    Files.createDirectories(Paths.get(s"$d2/_delta_log"))
    val schemaEsc = schemaStr.replace("\\", "\\\\")
      .replace("\"", "\\\"")
    Files.writeString(Paths.get(s"$d2/_delta_log/" +
      f"${2L}%020d.checkpoint.7d17ac10-json.json"),
      s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["v2Checkpoint"]}}
{"metaData":{"id":"x","schemaString":"$schemaEsc","format":{"provider":"parquet","options":{}},"partitionColumns":[],"configuration":{}}}
{"checkpointMetadata":{"version":2}}
{"add":{"path":"$f2","size":1,"partitionValues":{},"modificationTime":0,"dataChange":true}}
""")
    assert(DeltaInterop.readDelta(spark, d2).select("id").collect()
      .map(_.getLong(0)).toSet == Set(7L))
    // ---- a referenced sidecar that is MISSING refuses by name ----
    val d3 = tmp("delta_v2cp_missing")
    writeFile(d3, "a", Seq((1L, "a")))
    writeParquetAs(d3, topRows(1L, Seq("gone.parquet")), topSchema,
      "_delta_log/" + f"${1L}%020d.checkpoint.11112222-0000.parquet")
    val e3 = intercept[IllegalStateException] {
      DeltaInterop.readDelta(spark, d3)
    }
    assert(e3.getMessage.contains("missing sidecar") &&
      e3.getMessage.contains("gone.parquet"), e3.getMessage)
    // ---- checkpointMetadata version != file-name version refuses ----
    val d4 = tmp("delta_v2cp_badver")
    writeFile(d4, "a", Seq((1L, "a")))
    writeParquetAs(d4, topRows(9L, Seq.empty), topSchema,
      "_delta_log/" + f"${4L}%020d.checkpoint.33334444-0000.parquet")
    val e4 = intercept[IllegalArgumentException] {
      DeltaInterop.readDelta(spark, d4)
    }
    assert(e4.getMessage.contains("checkpointMetadata"), e4.getMessage)
  }

  test("versionAsOf BETWEEN two checkpoints: the read bases on the " +
      "newest complete checkpoint AT-OR-BELOW the requested version " +
      "even when a newer checkpoint exists and the early JSONs were " +
      "cleaned up under the older one") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val spark2 = spark
    import spark2.implicits._
    val dir = tmp("delta_cp_between")
    def writeFile(sub: String, rows: Seq[(Long, String)]): String = {
      rows.toDF("id", "s").coalesce(1).write.parquet(s"$dir/$sub")
      val f = new java.io.File(s"$dir/$sub").listFiles()
        .map(_.getName).find(_.endsWith(".parquet")).get
      s"$sub/$f"
    }
    val schemaStr = Seq((1L, "a")).toDF("id", "s").schema.json
    val cpSchema = StructType(Seq(
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType),
        StructField("minWriterVersion", IntegerType)))),
      StructField("metaData", StructType(Seq(
        StructField("id", StringType),
        StructField("schemaString", StringType),
        StructField("partitionColumns", ArrayType(StringType)),
        StructField("configuration",
          MapType(StringType, StringType))))),
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues",
          MapType(StringType, StringType)),
        StructField("size", LongType))))))
    def writeCheckpoint(v: Long, adds: Seq[String]): Unit = {
      val rows = Seq(
        Row(Row(1, 2), null, null),
        Row(null, Row("x", schemaStr, Seq.empty[String],
          Map.empty[String, String]), null)) ++
        adds.map(p => Row(null, null,
          Row(p, Map.empty[String, String], 1L)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), cpSchema)
        .coalesce(1).write.parquet(s"$dir/_cp_tmp")
      val part = new java.io.File(s"$dir/_cp_tmp").listFiles()
        .map(_.getName).find(_.endsWith(".parquet")).get
      Files.createDirectories(Paths.get(s"$dir/_delta_log"))
      Files.copy(Paths.get(s"$dir/_cp_tmp/$part"),
        Paths.get(s"$dir/_delta_log/" + f"$v%020d.checkpoint.parquet"))
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(s"$dir/_cp_tmp"))
    }
    val fA = writeFile("a", Seq((1L, "a")))
    val fB = writeFile("b", Seq((2L, "b")))
    val fC = writeFile("c", Seq((3L, "c")))
    // checkpoint v1 covers cleaned-up JSONs 0-1 (live: A);
    // JSON v2 adds B; JSON v3 adds C; checkpoint v3 covers A,B,C
    writeCheckpoint(1L, Seq(fA))
    Files.writeString(Paths.get(
      s"$dir/_delta_log/00000000000000000002.json"),
      s"""{"add":{"path":"$fB","size":1,"partitionValues":{},"modificationTime":0,"dataChange":true}}
""")
    Files.writeString(Paths.get(
      s"$dir/_delta_log/00000000000000000003.json"),
      s"""{"add":{"path":"$fC","size":1,"partitionValues":{},"modificationTime":0,"dataChange":true}}
""")
    writeCheckpoint(3L, Seq(fA, fB, fC))
    def idsAt(v: Option[Long]): Set[Long] =
      DeltaInterop.readDelta(spark, dir, v).select("id").collect()
        .map(_.getLong(0)).toSet
    assert(idsAt(None) == Set(1L, 2L, 3L))
    assert(idsAt(Some(3L)) == Set(1L, 2L, 3L))
    // v2 sits between the checkpoints: served from cp1 + JSON 2
    assert(idsAt(Some(2L)) == Set(1L, 2L))
    // v1 is exactly the older checkpoint
    assert(idsAt(Some(1L)) == Set(1L))
    // v0's commits are gone and no checkpoint <= 0 exists: refuse
    val e = intercept[IllegalStateException] { idsAt(Some(0L)) }
    assert(e.getMessage.contains("not reconstructable"), e.getMessage)
  }
}
