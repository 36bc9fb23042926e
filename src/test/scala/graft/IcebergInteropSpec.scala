package graft

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite
import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.functions._

import graft.sources.IcebergInterop
import graft.streaming.CdcApply

/** Iceberg-v1 interop ([[graft.sources.IcebergInterop]]): exports must
  * be structurally conformant to the PUBLIC Iceberg table spec —
  * JSON table metadata, REAL Avro manifest lists and manifests with
  * the spec's field names, ADDED/EXISTING accounting, and
  * parquet-footer column bounds in little-endian single-value form —
  * and round-trip through the engine's own v1 reader, including
  * snapshot time travel. Foreign/unsupported metadata refuses loudly.
  */
class IcebergInteropSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(p: String): String = java.nio.file.Files
    .createTempDirectory(p).toFile.getAbsolutePath

  private def buildCdc(): String = {
    import spark.implicits._
    val root = tmp("ice_cdc")
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

  /** Resolve a spec path — a full URI per the conformance contract,
    * with the relative fallback older trees used.
    */
  private def asFile(table: String, p: String): java.io.File =
    if (p.startsWith("file:"))
      new java.io.File(java.net.URI.create(p).getPath)
    else new java.io.File(table, p)

  private def avro(path: java.io.File): Seq[GenericRecord] = {
    val in = new DataFileStream[GenericRecord](
      new java.io.FileInputStream(path),
      new GenericDatumReader[GenericRecord]())
    try {
      val buf = scala.collection.mutable.ArrayBuffer[GenericRecord]()
      while (in.hasNext) buf += in.next()
      buf.toSeq
    } finally in.close()
  }

  test("export round-trips through the v1 reader; a later export is a " +
      "new snapshot and the old one stays time-travelable") {
    import spark.implicits._
    val root = buildCdc()
    val ice = tmp("ice_tbl")
    assert(IcebergInterop.exportIncremental(spark, root, ice)
      .contains(0L))
    val v0 = IcebergInterop.readIceberg(spark, ice)
    assert(v0.schema == CdcApply.readSnapshot(spark, root).get.schema)
    assert(state(v0) == Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
    // CDC moves on: update k=1, tombstone k=2 → snapshot 1
    assert(CdcApply.applyBatch(
      Seq((1L, 2L, 11.0, false), (2L, 2L, 20.0, true))
        .toDF("k", "version", "amount", "deleted"),
      1L, root, Seq("k"), "version", Some("deleted"), numBuckets = 2,
      commitTs = Some(2000L)))
    assert(IcebergInterop.exportIncremental(spark, root, ice)
      .contains(1L))
    assert(state(IcebergInterop.readIceberg(spark, ice)) ==
      Map(1L -> 11.0, 3L -> 30.0))
    // VERSION AS OF for the open format: snapshot 0 still serves the
    // pre-update state (its manifests and files are retained)
    assert(IcebergInterop.snapshots(spark, ice) == Seq(0L, 1L))
    assert(state(IcebergInterop.readIceberg(spark, ice, Some(0L))) ==
      Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
    // reads are ordinary parquet: filters behave
    assert(state(IcebergInterop.readIceberg(spark, ice)
      .filter(col("amount") > 20.0)) == Map(3L -> 30.0))
  }

  test("TIMESTAMP AS OF resolves the latest snapshot at-or-before " +
      "the instant via timestamp-ms: Scala, SQL (iceberg_scan_ts) " +
      "and shim (timestampAsOf) agree; before-first and " +
      "snapshotId+timestamp refuse") {
    import spark.implicits._
    val root = buildCdc()
    val ice = tmp("ice_ts")
    assert(IcebergInterop.exportIncremental(spark, root, ice)
      .contains(0L))
    assert(CdcApply.applyBatch(
      Seq((1L, 2L, 11.0, false), (2L, 2L, 20.0, true))
        .toDF("k", "version", "amount", "deleted"),
      1L, root, Seq("k"), "version", Some("deleted"), numBuckets = 2,
      commitTs = Some(2000L)))
    assert(IcebergInterop.exportIncremental(spark, root, ice)
      .contains(1L))
    // this exporter stamps timestamp-ms = snapshot id (deterministic
    // clock); a foreign tree would carry wall-clock millis — the
    // resolution rule is identical
    val old = Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0)
    val cur = Map(1L -> 11.0, 3L -> 30.0)
    assert(state(IcebergInterop.readIceberg(spark, ice,
      asOfTimestampMs = Some(0L))) == old)
    assert(state(IcebergInterop.readIceberg(spark, ice,
      asOfTimestampMs = Some(999L))) == cur)
    // SQL: epoch-millis instants ('...0.000Z' = ms 0, '.999Z' = 999)
    def sqlState(ts: String): Map[Long, Double] =
      spark.sql(s"SELECT k, amount FROM iceberg_scan_ts('$ice', " +
        s"'$ts')").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sqlState("1970-01-01T00:00:00Z") == old)
    assert(sqlState("1970-01-01T00:00:00.999Z") == cur)
    // shim
    assert(state(spark.read.format("graft-iceberg")
      .option("path", ice).option("timestampAsOf", "0").load()) == old)
    // before the first snapshot refuses
    val e = intercept[IllegalArgumentException] {
      IcebergInterop.readIceberg(spark, ice,
        asOfTimestampMs = Some(-1L))
    }
    assert(e.getMessage.contains("before the first retained snapshot"),
      e.getMessage)
    // both axes at once refuse
    val e2 = intercept[IllegalArgumentException] {
      IcebergInterop.readIceberg(spark, ice, Some(0L),
        asOfTimestampMs = Some(0L))
    }
    assert(e2.getMessage.contains("mutually exclusive"))
  }

  test("the metadata tree is structurally spec-conformant: v1 JSON " +
      "metadata, Avro manifest list with spec fields, Avro manifests " +
      "with footer stats and little-endian bounds") {
    val root = buildCdc()
    val ice = tmp("ice_struct")
    IcebergInterop.exportIncremental(spark, root, ice)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val metaFile = new java.io.File(ice, "metadata/v0.metadata.json")
    assert(metaFile.exists)
    val meta = mapper.readTree(
      java.nio.file.Files.readString(metaFile.toPath))
    assert(meta.get("format-version").asInt == 1)
    assert(meta.get("current-snapshot-id").asLong == 0L)
    // schema: sequential field ids, declared primitive types
    val fields = meta.get("schema").get("fields").elements()
      .asScala.toSeq
    assert(fields.map(_.get("id").asInt) == (1 to fields.size))
    // the deleted flag is merge state, not logical schema — the
    // snapshot read strips it, so the exported schema must too
    assert(fields.map(_.get("name").asText)
      .containsSlice(Seq("k", "version", "amount")))
    assert(!fields.map(_.get("name").asText).contains("deleted"))
    assert(meta.get("last-column-id").asInt == fields.size)
    // version hint (HadoopTables convention)
    assert(java.nio.file.Files.readString(new java.io.File(ice,
      "metadata/version-hint.text").toPath).trim == "0")
    // snapshot → manifest list (real Avro, spec field names)
    val snap = meta.get("snapshots").elements().asScala.toSeq.head
    // spec: manifest-list is a full URI
    assert(snap.get("manifest-list").asText.startsWith("file:"))
    val listFile = asFile(ice, snap.get("manifest-list").asText)
    assert(listFile.exists, listFile.toString)
    val manifests = avro(listFile)
    assert(manifests.nonEmpty)
    manifests.foreach { mf =>
      // spec: manifest_path is a full URI
      assert(mf.get("manifest_path").toString.startsWith("file:"))
      assert(mf.get("manifest_length").asInstanceOf[Long] > 0)
      assert(mf.get("partition_spec_id").asInstanceOf[Int] == 0)
      assert(mf.get("added_snapshot_id").asInstanceOf[Long] == 0L)
      assert(mf.get("added_data_files_count").asInstanceOf[Int] > 0)
      assert(mf.get("existing_data_files_count").asInstanceOf[Int] == 0)
    }
    // manifests: ADDED entries, PARQUET files, footer-exact row
    // counts, and k-column bounds that decode little-endian to the
    // true min/max keys
    val entries = manifests.flatMap(mf =>
      avro(asFile(ice, mf.get("manifest_path").toString)))
    assert(entries.forall(_.get("status").asInstanceOf[Int] == 1))
    val dataFiles = entries.map(
      _.get("data_file").asInstanceOf[GenericRecord])
    assert(dataFiles.forall(
      _.get("file_format").toString == "PARQUET"))
    assert(dataFiles.map(
      _.get("record_count").asInstanceOf[Long]).sum == 3L)
    dataFiles.foreach { df =>
      // spec: file_path is a full URI; block_size_in_bytes (field-id
      // 105) is v1-required — a real v1 reader fails resolution
      // without it
      assert(df.get("file_path").toString.startsWith("file:"))
      assert(df.get("block_size_in_bytes").asInstanceOf[Long] > 0L)
      val f = asFile(ice, df.get("file_path").toString)
      assert(f.exists && f.length ==
        df.get("file_size_in_bytes").asInstanceOf[Long])
    }
    def bound(df: GenericRecord, which: String, id: Int): Option[Long] =
      Option(df.get(which)).map(_.asInstanceOf[java.util.List[_]]
        .asScala.map(_.asInstanceOf[GenericRecord])
        .find(_.get("key").asInstanceOf[Int] == id))
        .flatten
        .map { kv =>
          val bb = kv.get("value").asInstanceOf[java.nio.ByteBuffer]
            .duplicate().order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.getLong
        }
    // field id 1 = k (first schema column): bounds across all files
    // recover the true key range 1..3
    val los = dataFiles.flatMap(bound(_, "lower_bounds", 1))
    val his = dataFiles.flatMap(bound(_, "upper_bounds", 1))
    assert(los.nonEmpty && his.nonEmpty)
    assert(los.min == 1L && his.max == 3L, s"$los / $his")
  }

  test("incremental export republishes ONLY changed buckets, reuses " +
      "unchanged manifests by path, and commits nothing on no change") {
    import spark.implicits._
    val root = tmp("ice_cdc_inc")
    val b0 = (1L to 40L).map(k => (k, 1L, k * 1.0, false))
      .toDF("k", "version", "amount", "deleted")
    assert(CdcApply.applyBatch(b0, 0L, root, Seq("k"), "version",
      Some("deleted"), numBuckets = 4, commitTs = Some(1000L)))
    val ice = tmp("ice_inc")
    assert(IcebergInterop.exportIncremental(spark, root, ice)
      .contains(0L))
    assert(state(IcebergInterop.readIceberg(spark, ice)) ==
      (1L to 40L).map(k => k -> k * 1.0).toMap)
    // no change → no snapshot
    assert(IcebergInterop.exportIncremental(spark, root, ice).isEmpty)
    // one-key update → exactly one bucket dir under data/v1
    assert(CdcApply.applyBatch(
      Seq((7L, 2L, 700.0, false))
        .toDF("k", "version", "amount", "deleted"),
      1L, root, Seq("k"), "version", Some("deleted"), numBuckets = 4,
      commitTs = Some(2000L)))
    assert(IcebergInterop.exportIncremental(spark, root, ice)
      .contains(1L))
    val v1Buckets = new java.io.File(ice, "data/v1").listFiles()
      .map(_.getName).toSet
    assert(v1Buckets.size == 1 && v1Buckets.head.startsWith("b"),
      s"expected one rewritten bucket, got $v1Buckets")
    // snapshot 1's manifest list: one fresh manifest (added counts),
    // three carried from snapshot 0 (existing counts, snap-0 paths)
    val manifests = avro(new java.io.File(ice, "metadata/snap-1.avro"))
    val fresh = manifests.filter(
      _.get("added_data_files_count").asInstanceOf[Int] > 0)
    val carried = manifests.filter(
      _.get("existing_data_files_count").asInstanceOf[Int] > 0)
    assert(fresh.size == 1 && carried.size == 3, manifests.toString)
    assert(fresh.head.get("manifest_path").toString
      .contains("manifest-1-"))
    assert(carried.forall(_.get("manifest_path").toString
      .contains("manifest-0-")))
    assert(carried.forall(
      _.get("added_snapshot_id").asInstanceOf[Long] == 0L))
    val expect = (1L to 40L).map(k =>
      k -> (if (k == 7L) 700.0 else k * 1.0)).toMap
    assert(state(IcebergInterop.readIceberg(spark, ice)) == expect)
    // row multiplicity too: carried + fresh manifests must not
    // double-serve any bucket
    assert(IcebergInterop.readIceberg(spark, ice).count() == 40L)
  }

  test("pre-commit crash debris (data dir, manifests, manifest list, " +
      "metadata tmp) is swept on the next attempt — a crashed export " +
      "never wedges the retry") {
    import spark.implicits._
    val root = buildCdc()
    val ice = tmp("ice_debris")
    assert(IcebergInterop.exportIncremental(spark, root, ice)
      .contains(0L))
    // simulate a crash mid-export of version 1: every pre-commit
    // artifact exists, the metadata rename never happened
    val v1 = new java.io.File(ice, "data/v1"); v1.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(v1, "junk.parquet").toPath, "junk")
    java.nio.file.Files.writeString(new java.io.File(ice,
      "metadata/manifest-1-b0.avro").toPath, "junk")
    java.nio.file.Files.writeString(new java.io.File(ice,
      "metadata/snap-1.avro").toPath, "junk")
    java.nio.file.Files.writeString(new java.io.File(ice,
      "metadata/.tmp-1").toPath, "junk")
    assert(CdcApply.applyBatch(
      Seq((1L, 2L, 11.0, false))
        .toDF("k", "version", "amount", "deleted"),
      1L, root, Seq("k"), "version", Some("deleted"), numBuckets = 2,
      commitTs = Some(2000L)))
    assert(IcebergInterop.exportIncremental(spark, root, ice)
      .contains(1L))
    assert(state(IcebergInterop.readIceberg(spark, ice)) ==
      Map(1L -> 11.0, 2L -> 20.0, 3L -> 30.0))
    assert(IcebergInterop.readIceberg(spark, ice).count() == 3L)
    assert(!new java.io.File(v1, "junk.parquet").exists,
      "orphaned junk must be swept, never committed")
  }

  test("a stale export-state stamp self-heals with a full rewrite; " +
      "foreign metadata dirs refuse incremental export") {
    import spark.implicits._
    val root = buildCdc()
    val ice = tmp("ice_heal")
    IcebergInterop.exportIncremental(spark, root, ice)
    assert(CdcApply.applyBatch(
      Seq((1L, 2L, 11.0, false))
        .toDF("k", "version", "amount", "deleted"),
      1L, root, Seq("k"), "version", Some("deleted"), numBuckets = 2,
      commitTs = Some(2000L)))
    IcebergInterop.exportIncremental(spark, root, ice)
    val good = state(IcebergInterop.readIceberg(spark, ice))
    val sf = new java.io.File(ice, "_graft_export_state.json")
    val text = java.nio.file.Files.readString(sf.toPath)
    new java.io.File(ice, "._graft_export_state.json.crc").delete()
    java.nio.file.Files.writeString(sf.toPath,
      text.replaceFirst("\"version\":1", "\"version\":0"))
    assert(IcebergInterop.exportIncremental(spark, root, ice)
      .contains(2L))
    assert(state(IcebergInterop.readIceberg(spark, ice)) == good)
    assert(IcebergInterop.readIceberg(spark, ice).count() ==
      good.size.toLong)
    assert(IcebergInterop.exportIncremental(spark, root, ice).isEmpty)
    // foreign lineage: metadata without our sidecar refuses
    val foreign = tmp("ice_foreign_state")
    java.nio.file.Files.createDirectories(
      new java.io.File(foreign, "metadata").toPath)
    java.nio.file.Files.writeString(new java.io.File(foreign,
      "metadata/v0.metadata.json").toPath, "{\"format-version\":1}")
    val e = intercept[IllegalStateException] {
      IcebergInterop.exportIncremental(spark, root, foreign)
    }
    assert(e.getMessage.contains("export state"), e.getMessage)
  }

  test("expireSnapshots retains only the current snapshot: dead " +
      "files/manifests/lists deleted, the live read is bit-identical, " +
      "and exports continue incrementally afterwards") {
    import spark.implicits._
    val root = buildCdc()
    val ice = tmp("ice_expire")
    assert(IcebergInterop.exportIncremental(spark, root, ice)
      .contains(0L))
    assert(CdcApply.applyBatch(
      Seq((1L, 2L, 11.0, false))
        .toDF("k", "version", "amount", "deleted"),
      1L, root, Seq("k"), "version", Some("deleted"), numBuckets = 2,
      commitTs = Some(2000L)))
    assert(IcebergInterop.exportIncremental(spark, root, ice)
      .contains(1L))
    val before = state(IcebergInterop.readIceberg(spark, ice))
    assert(IcebergInterop.snapshots(spark, ice) == Seq(0L, 1L))
    val dead = IcebergInterop.expireSnapshots(spark, ice)
    assert(dead.nonEmpty, "snapshot 0's exclusive files must die")
    dead.foreach(p => assert(!new java.io.File(ice, p).exists, p))
    assert(IcebergInterop.snapshots(spark, ice) == Seq(1L))
    assert(state(IcebergInterop.readIceberg(spark, ice)) == before)
    assert(IcebergInterop.readIceberg(spark, ice).count() ==
      before.size.toLong)
    // the expired snapshot stops resolving — loudly
    intercept[IllegalArgumentException] {
      IcebergInterop.readIceberg(spark, ice, Some(0L))
    }
    // idempotent: nothing left to expire or sweep
    assert(IcebergInterop.expireSnapshots(spark, ice).isEmpty)
    // lineage stays incremental: the next one-key change republishes
    // ONE bucket (no self-heal full rewrite after the re-stamp)
    assert(CdcApply.applyBatch(
      Seq((3L, 2L, 31.0, false))
        .toDF("k", "version", "amount", "deleted"),
      2L, root, Seq("k"), "version", Some("deleted"), numBuckets = 2,
      commitTs = Some(3000L)))
    val v = IcebergInterop.exportIncremental(spark, root, ice)
    assert(v.isDefined)
    val vDirs = new java.io.File(ice, s"data/v${v.get}").listFiles()
      .map(_.getName).toSet
    assert(vDirs.size == 1 && vDirs.head.startsWith("b"),
      s"expected one republished bucket after expire, got $vDirs")
    assert(state(IcebergInterop.readIceberg(spark, ice)) ==
      Map(1L -> 11.0, 2L -> 20.0, 3L -> 31.0))
  }

  test("continuous export follows the changelog: each applied batch " +
      "lands in the Iceberg mirror") {
    import spark.implicits._
    val root = tmp("ice_cont_cdc")
    val ice = tmp("ice_cont")
    val ckpt = tmp("ice_cont_ckpt")
    val b0 = Seq((1L, 1L, 10.0, false), (2L, 1L, 20.0, false))
      .toDF("k", "version", "amount", "deleted")
    assert(CdcApply.applyBatch(b0, 0L, root, Seq("k"), "version",
      Some("deleted"), numBuckets = 2, changelog = true,
      commitTs = Some(1000L)))
    val q = IcebergInterop.startContinuousExport(spark, root, ice, ckpt)
    try {
      q.processAllAvailable()
      assert(state(IcebergInterop.readIceberg(spark, ice)) ==
        Map(1L -> 10.0, 2L -> 20.0))
      assert(CdcApply.applyBatch(
        Seq((1L, 2L, 11.0, false), (3L, 1L, 30.0, false))
          .toDF("k", "version", "amount", "deleted"),
        1L, root, Seq("k"), "version", Some("deleted"), numBuckets = 2,
        changelog = true, commitTs = Some(2000L)))
      q.processAllAvailable()
      assert(state(IcebergInterop.readIceberg(spark, ice)) ==
        Map(1L -> 11.0, 2L -> 20.0, 3L -> 30.0))
    } finally q.stop()
    val plain = tmp("ice_cont_plain")
    assert(CdcApply.applyBatch(b0, 0L, plain, Seq("k"), "version",
      Some("deleted"), commitTs = Some(1000L)))
    val e = intercept[IllegalArgumentException] {
      IcebergInterop.startContinuousExport(spark, plain,
        tmp("icx"), tmp("icy"))
    }
    assert(e.getMessage.contains("changelog"), e.getMessage)
  }

  test("format(\"iceberg\") reads exports through the DataFrameReader " +
      "protocol (snapshotId option = VERSION AS OF); additive CDC " +
      "schema evolution flows into the export and old snapshots read " +
      "NULL for the new column") {
    import spark.implicits._
    val root = buildCdc()
    val ice = tmp("ice_fmt")
    assert(IcebergInterop.exportIncremental(spark, root, ice)
      .contains(0L))
    // additive evolution mid-stream: batch 1 introduces `bonus`
    assert(CdcApply.applyBatch(
      Seq((1L, 2L, 11.0, false, 7L))
        .toDF("k", "version", "amount", "deleted", "bonus"),
      1L, root, Seq("k"), "version", Some("deleted"), numBuckets = 2,
      commitTs = Some(2000L)))
    assert(IcebergInterop.exportIncremental(spark, root, ice)
      .contains(1L))
    val live = spark.read.format("iceberg").option("path", ice).load()
    assert(live.schema.fieldNames.contains("bonus"))
    val got = live.select("k", "amount", "bonus").collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(got == Set((1L, 11.0, Some(7L)), (2L, 20.0, None),
      (3L, 30.0, None)), got.toString)
    // filters flow through the relation seam
    assert(live.filter(col("amount") > 15.0).count() == 2L)
    // snapshot 0 predates the evolution: its files lack the column,
    // the declared CURRENT schema reads it back as NULL everywhere
    val v0 = spark.read.format("iceberg").option("path", ice)
      .option("snapshotId", "0").load()
    assert(v0.select("k", "amount").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet ==
      Set(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
    assert(v0.filter(col("bonus").isNotNull).isEmpty)
  }

  test("format versions beyond v2 and unsupported column types " +
      "refuse loudly") {
    val dir = tmp("ice_v3")
    java.nio.file.Files.createDirectories(
      new java.io.File(dir, "metadata").toPath)
    java.nio.file.Files.writeString(new java.io.File(dir,
      "metadata/v0.metadata.json").toPath,
      """{"format-version":3,"schema":{"type":"struct","fields":[]}}""")
    val e = intercept[UnsupportedOperationException] {
      IcebergInterop.readIceberg(spark, dir)
    }
    assert(e.getMessage.contains("format-version 3"), e.getMessage)
    // an unsupported column type in otherwise-valid v1 metadata
    val dir2 = tmp("ice_badtype")
    java.nio.file.Files.createDirectories(
      new java.io.File(dir2, "metadata").toPath)
    java.nio.file.Files.writeString(new java.io.File(dir2,
      "metadata/v0.metadata.json").toPath,
      """{"format-version":1,"current-snapshot-id":0,"snapshots":[],
        |"schema":{"type":"struct","fields":[
        |{"id":1,"name":"m","required":false,
        |"type":"map"}]}}""".stripMargin)
    val e2 = intercept[UnsupportedOperationException] {
      IcebergInterop.readIceberg(spark, dir2)
    }
    assert(e2.getMessage.contains("unsupported column type"),
      e2.getMessage)
    // export-side refusal: a CDC table with an array column
    import spark.implicits._
    val root = tmp("ice_badtype_cdc")
    val b0 = Seq((1L, 1L, Seq(1.0, 2.0)))
      .toDF("k", "version", "vals")
    assert(CdcApply.applyBatch(b0, 0L, root, Seq("k"), "version",
      None, numBuckets = 2, commitTs = Some(1000L)))
    val e3 = intercept[UnsupportedOperationException] {
      IcebergInterop.exportIncremental(spark, root, tmp("ice_badtype_t"))
    }
    assert(e3.getMessage.contains("primitive columns only"),
      e3.getMessage)
  }
}
