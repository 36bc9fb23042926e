package graft

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader,
  GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.functions._

import graft.sources.{IcebergInterop, IcebergV2}
import graft.streaming.CdcApply

/** Iceberg FORMAT-VERSION 2 ([[graft.sources.IcebergV2]]): O(batch)
  * incremental export via equality delete files, sequence-number
  * resolution (strictly-below for equality, at-or-below for position
  * deletes), manifest-list carry-forward, compaction + expiry, the
  * foreign-tree read path (position deletes, null entry-seq
  * inheritance, schemas-array-only metadata), and the v1/v2 lineage
  * guards.
  */
class IcebergV2Spec extends AnyFunSuite with SparkTestBase {

  private def tmp(p: String): String = java.nio.file.Files
    .createTempDirectory(p).toFile.getAbsolutePath

  private def state(df: org.apache.spark.sql.DataFrame)
      : Map[Long, Double] =
    df.select("k", "amount").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

  private def buildCdc(): String = {
    import spark.implicits._
    val root = tmp("icev2_cdc")
    val b0 = Seq((1L, 1L, 10.0, false), (2L, 1L, 20.0, false),
      (3L, 1L, 30.0, false)).toDF("k", "version", "amount", "deleted")
    assert(CdcApply.applyBatch(b0, 0L, root, Seq("k"), "version",
      Some("deleted"), numBuckets = 2, commitTs = Some(1000L)))
    root
  }

  test("incremental v2 export is O(batch): a sync appends the net " +
      "upserts as a data file and the touched keys as an equality " +
      "delete file — no bucket materialization — and the read " +
      "resolves latest-wins; a deleted key re-inserted later " +
      "survives the older delete's sequence number") {
    import spark.implicits._
    val root = buildCdc()
    val ice = tmp("icev2_tbl")
    assert(IcebergV2.exportIncremental(spark, root, ice).contains(0L))
    assert(state(IcebergInterop.readIceberg(spark, ice)) ==
      Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
    // batch 1: update k=1, tombstone k=2
    assert(CdcApply.applyBatch(
      Seq((1L, 2L, 11.0, false), (2L, 2L, 20.0, true))
        .toDF("k", "version", "amount", "deleted"),
      1L, root, Seq("k"), "version", Some("deleted"), numBuckets = 2,
      commitTs = Some(2000L)))
    assert(IcebergV2.exportIncremental(spark, root, ice).contains(1L))
    assert(state(IcebergInterop.readIceberg(spark, ice)) ==
      Map(1L -> 11.0, 3L -> 30.0))
    // O(batch) witness: the sync's data dir holds exactly the ONE
    // upserted row — not the two-row bucket it lives in
    assert(spark.read.parquet(s"$ice/data/v1/data").count() == 1L)
    // delete-file witness: one equality delete file, two shadowed keys
    assert(IcebergV2.deleteFileStats(spark, ice) == (1, 2L))
    // time travel: snapshot 0 predates the delete manifests entirely
    assert(state(IcebergInterop.readIceberg(spark, ice, Some(0L))) ==
      Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
    // no movement → no snapshot
    assert(IcebergV2.exportIncremental(spark, root, ice).isEmpty)
    // batch 2: RE-INSERT k=2 — the new image is at a HIGHER sequence
    // than the equality delete that killed the old one, so the
    // strictly-below rule must let it live
    assert(CdcApply.applyBatch(
      Seq((2L, 3L, 22.0, false)).toDF("k", "version", "amount", "deleted"),
      2L, root, Seq("k"), "version", Some("deleted"), numBuckets = 2,
      commitTs = Some(3000L)))
    assert(IcebergV2.exportIncremental(spark, root, ice).contains(2L))
    assert(state(IcebergInterop.readIceberg(spark, ice)) ==
      Map(1L -> 11.0, 2L -> 22.0, 3L -> 30.0))
    assert(IcebergInterop.snapshots(spark, ice) == Seq(0L, 1L, 2L))
    // filters flow through the resolved plan
    assert(state(IcebergInterop.readIceberg(spark, ice)
      .filter(col("amount") > 20.0)) == Map(2L -> 22.0, 3L -> 30.0))
    // format("iceberg") serves v2 through the DataFrameReader shim,
    // snapshot option included
    assert(state(spark.read.format("iceberg").option("path", ice)
      .load()) == Map(1L -> 11.0, 2L -> 22.0, 3L -> 30.0))
    assert(state(spark.read.format("iceberg").option("path", ice)
      .option("snapshotId", "0").load()) ==
      Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
  }

  test("compact folds the MOR tail into one data manifest and " +
      "expireSnapshots sweeps the superseded data + delete files; " +
      "incremental export continues on the compacted lineage") {
    import spark.implicits._
    val root = buildCdc()
    val ice = tmp("icev2_compact")
    assert(IcebergV2.exportIncremental(spark, root, ice).contains(0L))
    assert(CdcApply.applyBatch(
      Seq((1L, 2L, 11.0, false), (2L, 2L, 20.0, true))
        .toDF("k", "version", "amount", "deleted"),
      1L, root, Seq("k"), "version", Some("deleted"), numBuckets = 2,
      commitTs = Some(2000L)))
    assert(IcebergV2.exportIncremental(spark, root, ice).contains(1L))
    val before = state(IcebergInterop.readIceberg(spark, ice))
    assert(IcebergV2.deleteFileStats(spark, ice)._1 == 1)
    // the scheduler: 2 delete rows vs 4 data rows (3 base + 1 upsert)
    // is over a 20% ratio → compacts; a tight enough ratio declines
    assert(IcebergV2.compactIfNeeded(spark, root, ice,
      maxDeleteRatio = 0.9).isEmpty, "under-threshold must not compact")
    // compact: new snapshot, zero delete files, identical state
    assert(IcebergV2.compactIfNeeded(spark, root, ice,
      maxDeleteRatio = 0.2).contains(2L))
    assert(state(IcebergInterop.readIceberg(spark, ice)) == before)
    assert(IcebergV2.deleteFileStats(spark, ice) == (0, 0L))
    // expire: superseded files (v1's delete parquet among them) die
    val dead = IcebergInterop.expireSnapshots(spark, ice)
    assert(dead.exists(_.startsWith("data/v1/deletes/")),
      s"the equality delete file must be swept: $dead")
    assert(dead.exists(_.startsWith("data/v0/")), dead.toString)
    dead.foreach(p => assert(!new java.io.File(ice, p).exists, p))
    assert(IcebergInterop.snapshots(spark, ice) == Seq(2L))
    assert(state(IcebergInterop.readIceberg(spark, ice)) == before)
    // lineage survives maintenance: the next trickle change exports
    // incrementally (one-row data file, one delete file)
    assert(CdcApply.applyBatch(
      Seq((3L, 2L, 33.0, false)).toDF("k", "version", "amount", "deleted"),
      2L, root, Seq("k"), "version", Some("deleted"), numBuckets = 2,
      commitTs = Some(3000L)))
    // expiry committed metadata v3, so the sync lands as v4
    assert(IcebergV2.exportIncremental(spark, root, ice).contains(4L))
    // k=2 stays dead (tombstoned in batch 1, compacted away); only
    // k=3's post-compaction update lands
    assert(state(IcebergInterop.readIceberg(spark, ice)) ==
      Map(1L -> 11.0, 3L -> 33.0))
    assert(spark.read.parquet(s"$ice/data/v4/data").count() == 1L)
    assert(IcebergV2.deleteFileStats(spark, ice) == (1, 1L))
  }

  test("a foreign v2 tree reads correctly: position deletes applied " +
      "at-or-below their sequence, null entry sequence numbers " +
      "inherit the manifest list's, schemas-array-only metadata " +
      "resolves, and columns match by FIELD ID — a foreign rename " +
      "(file names differ from the current schema's) still serves " +
      "the values") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = tmp("icev2_foreign")
    new java.io.File(dir, "metadata").mkdirs()
    new java.io.File(dir, "data").mkdirs()
    // one data file: 4 rows, known order (single partition write),
    // written under the PRE-RENAME physical names (k_old, amount_old)
    // with Iceberg field ids 1/2 in the parquet schema — exactly what
    // a real writer's files look like after a metadata-only rename
    val fileSchema = StructType(Seq(
      StructField("k_old", LongType, nullable = false,
        new MetadataBuilder().putLong("parquet.field.id", 1L).build()),
      StructField("amount_old", DoubleType, nullable = false,
        new MetadataBuilder().putLong("parquet.field.id", 2L).build())))
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, 10.0), org.apache.spark.sql.Row(2L, 20.0),
        org.apache.spark.sql.Row(3L, 30.0), org.apache.spark.sql.Row(4L, 40.0)), 1),
      fileSchema)
      .sortWithinPartitions("k_old")
      .write.parquet(s"$dir/data/d0")
    val dataFile = new java.io.File(s"$dir/data/d0").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    // one position-delete file killing rows 1 and 3 (k=2, k=4),
    // file_path in the SINGLE-SLASH uri form (Hadoop's rendering) —
    // the reader must canonicalize against Spark's triple-slash
    // _metadata.file_path
    Seq((s"file:${dataFile.getAbsolutePath}", 1L),
      (s"file:${dataFile.getAbsolutePath}", 3L))
      .toDF("file_path", "pos").coalesce(1)
      .write.parquet(s"$dir/data/pd0")
    val pdFile = new java.io.File(s"$dir/data/pd0").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    // hand-written v2 avro (independent of the engine's writer)
    val entrySchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int","field-id":0},
        |{"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
        |{"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
        |{"name":"content","type":"int","field-id":134},
        |{"name":"file_path","type":"string","field-id":100},
        |{"name":"file_format","type":"string","field-id":101},
        |{"name":"record_count","type":"long","field-id":103},
        |{"name":"file_size_in_bytes","type":"long","field-id":104}
        |]}}]}""".stripMargin)
    def writeManifest(name: String, content: Int, path: String,
        rows: Long): Unit = {
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](entrySchema))
      w.create(entrySchema, new java.io.FileOutputStream(
        new java.io.File(dir, s"metadata/$name")))
      val df = new GenericData.Record(
        entrySchema.getField("data_file").schema())
      df.put("content", content)
      df.put("file_path", path)
      df.put("file_format", "PARQUET")
      df.put("record_count", rows)
      df.put("file_size_in_bytes", 1L)
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1)
      e.put("sequence_number", null) // INHERITED from the list
      e.put("data_file", df)
      w.append(e)
      w.close()
    }
    writeManifest("m-data.avro", 0,
      s"file:${dataFile.getAbsolutePath}", 4L)
    writeManifest("m-del.avro", 1,
      s"file:${pdFile.getAbsolutePath}", 2L)
    val listSchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_file","fields":[
        |{"name":"manifest_path","type":"string","field-id":500},
        |{"name":"manifest_length","type":"long","field-id":501},
        |{"name":"content","type":"int","field-id":517},
        |{"name":"sequence_number","type":"long","field-id":515}
        |]}""".stripMargin)
    val lw = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](listSchema))
    lw.create(listSchema, new java.io.FileOutputStream(
      new java.io.File(dir, "metadata/snap-0.avro")))
    def listEntry(name: String, content: Int, seq: Long): Unit = {
      val r = new GenericData.Record(listSchema)
      r.put("manifest_path", s"metadata/$name") // relative fallback
      r.put("manifest_length", 1L)
      r.put("content", content)
      r.put("sequence_number", seq)
      lw.append(r)
    }
    listEntry("m-data.avro", 0, 1L)
    listEntry("m-del.avro", 1, 1L) // same-commit position delete
    lw.close()
    // metadata: v2-native shape — schemas array, NO legacy "schema"
    java.nio.file.Files.writeString(new java.io.File(dir,
      "metadata/v0.metadata.json").toPath,
      s"""{"format-version":2,"last-sequence-number":1,
         |"current-schema-id":0,"schemas":[{"type":"struct",
         |"schema-id":0,"fields":[
         |{"id":1,"name":"k","required":false,"type":"long"},
         |{"id":2,"name":"amount","required":false,"type":"double"}]}],
         |"current-snapshot-id":0,"snapshots":[{"snapshot-id":0,
         |"sequence-number":1,
         |"manifest-list":"$dir/metadata/snap-0.avro"}]}"""
        .stripMargin.replace("\n", ""))
    assert(state(IcebergInterop.readIceberg(spark, dir)) ==
      Map(1L -> 10.0, 3L -> 30.0))
  }

  test("continuous v2 export follows the changelog: each applied " +
      "batch lands as one O(batch) MOR snapshot in the mirror") {
    import spark.implicits._
    val root = tmp("icev2_cont_cdc")
    val ice = tmp("icev2_cont")
    val ckpt = tmp("icev2_cont_ckpt")
    val b0 = Seq((1L, 1L, 10.0, false), (2L, 1L, 20.0, false))
      .toDF("k", "version", "amount", "deleted")
    assert(CdcApply.applyBatch(b0, 0L, root, Seq("k"), "version",
      Some("deleted"), numBuckets = 2, changelog = true,
      commitTs = Some(1000L)))
    val q = IcebergV2.startContinuousExport(spark, root, ice, ckpt)
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
      // the follow-up sync was MOR-shaped: delete file present
      assert(IcebergV2.deleteFileStats(spark, ice)._1 == 1)
    } finally q.stop()
  }

  test("lineage guards: a v1 export dir refuses v2 continuation and " +
      "vice versa; foreign v2 metadata without our sidecar refuses " +
      "incremental export") {
    val root = buildCdc()
    val v1dir = tmp("icev2_guard_v1")
    IcebergInterop.exportIncremental(spark, root, v1dir)
    val e1 = intercept[IllegalStateException] {
      IcebergV2.exportIncremental(spark, root, v1dir)
    }
    assert(e1.getMessage.contains("format v1"), e1.getMessage)
    val v2dir = tmp("icev2_guard_v2")
    IcebergV2.exportIncremental(spark, root, v2dir)
    val e2 = intercept[IllegalStateException] {
      IcebergInterop.exportIncremental(spark, root, v2dir)
    }
    assert(e2.getMessage.contains("format v2"), e2.getMessage)
    val foreign = tmp("icev2_guard_foreign")
    new java.io.File(foreign, "metadata").mkdirs()
    java.nio.file.Files.writeString(new java.io.File(foreign,
      "metadata/v0.metadata.json").toPath, "{\"format-version\":2}")
    val e3 = intercept[IllegalStateException] {
      IcebergV2.exportIncremental(spark, root, foreign)
    }
    assert(e3.getMessage.contains("export state"), e3.getMessage)
  }

  test("randomized (seeded) batch sequences: after every sync the v2 " +
      "tree resolves to exactly the CDC snapshot, and every retained " +
      "snapshot time-travels to its era's state") {
    import spark.implicits._
    val rnd = new scala.util.Random(180018L)
    val root = tmp("icev2_prop_cdc")
    val ice = tmp("icev2_prop_ice")
    // evolving ground truth the engine must match
    var truth = Map.empty[Long, Double]
    var eras = Vector.empty[(Long, Map[Long, Double])] // snapId -> state
    (0 until 8).foreach { b =>
      val keys = (1L to 12L).filter(_ => rnd.nextBoolean())
      val rows = keys.map { k =>
        val del = truth.contains(k) && rnd.nextInt(3) == 0
        val v = (b + 1).toLong
        val amt = math.round(rnd.nextDouble() * 1000) / 10.0
        (k, v, amt, del)
      }
      if (rows.nonEmpty) {
        assert(CdcApply.applyBatch(
          rows.toDF("k", "version", "amount", "deleted"),
          b.toLong, root, Seq("k"), "version", Some("deleted"),
          numBuckets = 3, commitTs = Some(1000L * (b + 1))))
        rows.foreach { case (k, _, amt, del) =>
          truth = if (del) truth - k else truth + (k -> amt)
        }
        val snap = IcebergV2.exportIncremental(spark, root, ice)
        assert(snap.isDefined, s"batch $b must commit a snapshot")
        eras = eras :+ (snap.get -> truth)
        assert(state(IcebergInterop.readIceberg(spark, ice)) == truth,
          s"batch $b: v2 resolution diverged from ground truth")
        // row multiplicity too: latest-wins must not double-serve
        assert(IcebergInterop.readIceberg(spark, ice).count() ==
          truth.size.toLong, s"batch $b: duplicate rows")
      }
    }
    assert(eras.size >= 4, s"seed must exercise several syncs: $eras")
    // every retained snapshot still serves its own era
    eras.foreach { case (snapId, st) =>
      assert(state(IcebergInterop.readIceberg(spark, ice,
        Some(snapId))) == st, s"snapshot $snapId era drifted")
    }
  }

  test("a stale v2 export-state stamp self-heals with a full-rewrite " +
      "snapshot and the lineage continues") {
    import spark.implicits._
    val root = buildCdc()
    val ice = tmp("icev2_heal")
    IcebergV2.exportIncremental(spark, root, ice)
    assert(CdcApply.applyBatch(
      Seq((1L, 2L, 11.0, false)).toDF("k", "version", "amount", "deleted"),
      1L, root, Seq("k"), "version", Some("deleted"), numBuckets = 2,
      commitTs = Some(2000L)))
    IcebergV2.exportIncremental(spark, root, ice)
    val good = state(IcebergInterop.readIceberg(spark, ice))
    val sf = new java.io.File(ice, "_graft_export_state.json")
    val text = java.nio.file.Files.readString(sf.toPath)
    new java.io.File(ice, "._graft_export_state.json.crc").delete()
    java.nio.file.Files.writeString(sf.toPath,
      text.replaceFirst("\"version\":1", "\"version\":0"))
    assert(IcebergV2.exportIncremental(spark, root, ice).contains(2L))
    assert(state(IcebergInterop.readIceberg(spark, ice)) == good)
    // healed snapshot is a clean full rewrite — no delete files
    assert(IcebergV2.deleteFileStats(spark, ice) == (0, 0L))
    assert(IcebergV2.exportIncremental(spark, root, ice).isEmpty)
  }

  test("metastore-convention metadata names (<seq>-<uuid>." +
      "metadata.json) resolve like v-named ones") {
    val root = buildCdc()
    val ice = tmp("icev2_names")
    IcebergV2.exportIncremental(spark, root, ice)
    val good = state(IcebergInterop.readIceberg(spark, ice))
    val meta = new java.io.File(ice, "metadata")
    assert(new java.io.File(meta, "v0.metadata.json").renameTo(
      new java.io.File(meta,
        "00000-8a5f2c3d-1b4e-4f6a-9c7d-0e1f2a3b4c5d.metadata.json")))
    new java.io.File(meta, ".v0.metadata.json.crc").delete()
    assert(state(IcebergInterop.readIceberg(spark, ice)) == good)
    assert(IcebergInterop.snapshots(spark, ice) == Seq(0L))
  }

  test("position deletes match across URI renderings: a data path " +
      "with a space (raw in the writer's manifests, %20-encoded in " +
      "Spark's _metadata.file_path) still resolves") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = tmp("icev2_uri edge") // note the space
    new java.io.File(dir, "metadata").mkdirs()
    val fileSchema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("amount", DoubleType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, 10.0),
        org.apache.spark.sql.Row(2L, 20.0)), 1), fileSchema)
      .sortWithinPartitions("k")
      .write.parquet(s"$dir/data/d 0")
    val dataFile = new java.io.File(s"$dir/data/d 0").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    // the delete file references the data file by its RAW location
    // string (what real writers store) — no percent-encoding
    Seq((s"file:${dataFile.getAbsolutePath}", 0L))
      .toDF("file_path", "pos").coalesce(1)
      .write.parquet(s"$dir/data/pd 0")
    val pdFile = new java.io.File(s"$dir/data/pd 0").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val entrySchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int","field-id":0},
        |{"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
        |{"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
        |{"name":"content","type":"int","field-id":134},
        |{"name":"file_path","type":"string","field-id":100},
        |{"name":"file_format","type":"string","field-id":101},
        |{"name":"record_count","type":"long","field-id":103},
        |{"name":"file_size_in_bytes","type":"long","field-id":104}
        |]}}]}""".stripMargin)
    def writeManifest(name: String, content: Int, path: String,
        rows: Long): Unit = {
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](entrySchema))
      w.create(entrySchema, new java.io.FileOutputStream(
        new java.io.File(dir, s"metadata/$name")))
      val df = new GenericData.Record(
        entrySchema.getField("data_file").schema())
      df.put("content", content)
      df.put("file_path", path)
      df.put("file_format", "PARQUET")
      df.put("record_count", rows)
      df.put("file_size_in_bytes", 1L)
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1)
      e.put("sequence_number", null)
      e.put("data_file", df)
      w.append(e)
      w.close()
    }
    writeManifest("m-data.avro", 0,
      s"file:${dataFile.getAbsolutePath}", 2L)
    writeManifest("m-del.avro", 1,
      s"file:${pdFile.getAbsolutePath}", 1L)
    val listSchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_file","fields":[
        |{"name":"manifest_path","type":"string","field-id":500},
        |{"name":"manifest_length","type":"long","field-id":501},
        |{"name":"content","type":"int","field-id":517},
        |{"name":"sequence_number","type":"long","field-id":515}
        |]}""".stripMargin)
    val lw = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](listSchema))
    lw.create(listSchema, new java.io.FileOutputStream(
      new java.io.File(dir, "metadata/snap-0.avro")))
    Seq(("m-data.avro", 0), ("m-del.avro", 1)).foreach { case (n, c) =>
      val r = new GenericData.Record(listSchema)
      r.put("manifest_path", s"metadata/$n")
      r.put("manifest_length", 1L)
      r.put("content", c)
      r.put("sequence_number", 1L)
      lw.append(r)
    }
    lw.close()
    java.nio.file.Files.writeString(new java.io.File(dir,
      "metadata/v0.metadata.json").toPath,
      s"""{"format-version":2,"last-sequence-number":1,
         |"current-schema-id":0,"schemas":[{"type":"struct",
         |"schema-id":0,"fields":[
         |{"id":1,"name":"k","required":false,"type":"long"},
         |{"id":2,"name":"amount","required":false,"type":"double"}]}],
         |"current-snapshot-id":0,"snapshots":[{"snapshot-id":0,
         |"sequence-number":1,
         |"manifest-list":"$dir/metadata/snap-0.avro"}]}"""
        .stripMargin.replace("\n", ""))
    // row 0 (k=1) is position-deleted; a rendering mismatch would
    // silently serve BOTH rows
    assert(state(IcebergInterop.readIceberg(spark, dir)) ==
      Map(2L -> 20.0))
  }

  test("a partitioned foreign tree prunes files on identity-" +
      "transform predicates at the MANIFEST level: values unchanged, " +
      "physical file set a strict subset; non-identity conjuncts and " +
      "mixed predicates never over-prune") {
    import org.apache.spark.sql.types._
    val dir = tmp("icev2_part")
    new java.io.File(dir, "metadata").mkdirs()
    // two identity-partitioned data files (p=1, p=2); Iceberg data
    // files CARRY the partition source column
    val rows1 = Seq(
      org.apache.spark.sql.Row(1L, 10.0, 1), org.apache.spark.sql.Row(2L, 20.0, 1))
    val rows2 = Seq(
      org.apache.spark.sql.Row(3L, 30.0, 2), org.apache.spark.sql.Row(4L, 40.0, 2))
    val fileSchema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("amount", DoubleType, nullable = false),
      StructField("p", IntegerType, nullable = false)))
    def writeData(sub: String,
        rows: Seq[org.apache.spark.sql.Row]): java.io.File = {
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), fileSchema)
        .write.parquet(s"$dir/data/$sub")
      new java.io.File(s"$dir/data/$sub").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
    }
    val f1 = writeData("p1", rows1)
    val f2 = writeData("p2", rows2)
    // manifests whose entries carry the partition record {p: int}
    val entrySchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int","field-id":0},
        |{"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
        |{"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
        |{"name":"content","type":"int","field-id":134},
        |{"name":"file_path","type":"string","field-id":100},
        |{"name":"file_format","type":"string","field-id":101},
        |{"name":"partition","field-id":102,"type":{"type":"record","name":"r102","fields":[
        |{"name":"p","type":"int","field-id":1000}]}},
        |{"name":"record_count","type":"long","field-id":103},
        |{"name":"file_size_in_bytes","type":"long","field-id":104},
        |{"name":"lower_bounds","field-id":125,"default":null,"type":["null",
        |{"type":"array","items":{"type":"record","name":"kv1","fields":[
        |{"name":"key","type":"int","field-id":126},
        |{"name":"value","type":"bytes","field-id":127}]}}]},
        |{"name":"upper_bounds","field-id":128,"default":null,"type":["null",
        |{"type":"array","items":{"type":"record","name":"kv2","fields":[
        |{"name":"key","type":"int","field-id":129},
        |{"name":"value","type":"bytes","field-id":130}]}}]}
        |]}}]}""".stripMargin)
    // k bounds in the spec's single-value form: 8-byte little-endian
    def le64(v: Long): Array[Byte] =
      (0 until 8).map(i => ((v >>> (8 * i)) & 0xff).toByte).toArray
    def kBound(schema: org.apache.avro.Schema, id: Int,
        v: Long): Object = {
      val item = schema.getTypes.get(1).getElementType
      val r = new GenericData.Record(item)
      r.put("key", id)
      r.put("value", java.nio.ByteBuffer.wrap(le64(v)))
      java.util.Collections.singletonList(r)
    }
    def writeManifest(name: String, path: String, p: Int,
        kLo: Long, kHi: Long): Unit = {
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](entrySchema))
      w.create(entrySchema, new java.io.FileOutputStream(
        new java.io.File(dir, s"metadata/$name")))
      val dfSchema = entrySchema.getField("data_file").schema()
      val part = new GenericData.Record(
        dfSchema.getField("partition").schema())
      part.put("p", p)
      val df = new GenericData.Record(dfSchema)
      df.put("content", 0)
      df.put("file_path", s"file:${path}")
      df.put("file_format", "PARQUET")
      df.put("partition", part)
      df.put("record_count", 2L)
      df.put("file_size_in_bytes", 1L)
      df.put("lower_bounds",
        kBound(dfSchema.getField("lower_bounds").schema(), 1, kLo))
      df.put("upper_bounds",
        kBound(dfSchema.getField("upper_bounds").schema(), 1, kHi))
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1)
      e.put("sequence_number", null)
      e.put("data_file", df)
      w.append(e)
      w.close()
    }
    writeManifest("m-p1.avro", f1.getAbsolutePath, 1, 1L, 2L)
    writeManifest("m-p2.avro", f2.getAbsolutePath, 2, 3L, 4L)
    val listSchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_file","fields":[
        |{"name":"manifest_path","type":"string","field-id":500},
        |{"name":"manifest_length","type":"long","field-id":501},
        |{"name":"partition_spec_id","type":"int","field-id":502},
        |{"name":"content","type":"int","field-id":517},
        |{"name":"sequence_number","type":"long","field-id":515}
        |]}""".stripMargin)
    val lw = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](listSchema))
    lw.create(listSchema, new java.io.FileOutputStream(
      new java.io.File(dir, "metadata/snap-0.avro")))
    Seq("m-p1.avro", "m-p2.avro").foreach { n =>
      val r = new GenericData.Record(listSchema)
      r.put("manifest_path", s"metadata/$n")
      r.put("manifest_length", 1L)
      r.put("partition_spec_id", 0)
      r.put("content", 0)
      r.put("sequence_number", 1L)
      lw.append(r)
    }
    lw.close()
    // v2 metadata with an identity partition spec AND a bucket field
    // (the bucket transform must not participate in pruning)
    java.nio.file.Files.writeString(new java.io.File(dir,
      "metadata/v0.metadata.json").toPath,
      s"""{"format-version":2,"last-sequence-number":1,
         |"current-schema-id":0,"schemas":[{"type":"struct",
         |"schema-id":0,"fields":[
         |{"id":1,"name":"k","required":false,"type":"long"},
         |{"id":2,"name":"amount","required":false,"type":"double"},
         |{"id":3,"name":"p","required":false,"type":"int"}]}],
         |"default-spec-id":0,"partition-specs":[{"spec-id":0,
         |"fields":[
         |{"name":"p","transform":"identity","source-id":3,"field-id":1000},
         |{"name":"k_bucket","transform":"bucket[4]","source-id":1,"field-id":1001}]}],
         |"current-snapshot-id":0,"snapshots":[{"snapshot-id":0,
         |"sequence-number":1,
         |"manifest-list":"$dir/metadata/snap-0.avro"}]}"""
        .stripMargin.replace("\n", ""))
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.queryExecution.executedPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.toPartitionArray
            .map(_.filePath.toString).toSeq
      }.flatten.toSet
    // unpruned read serves all four rows over both files
    val all = IcebergInterop.readIceberg(spark, dir)
    assert(state(all) ==
      Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0, 4L -> 40.0))
    assert(scannedFiles(all).size == 2)
    // identity predicate: values identical to filter-after-read,
    // physical file set a STRICT SUBSET (only the p=1 file)
    val pruned = IcebergInterop.readIceberg(spark, dir,
      where = Some("p = 1"))
    assert(state(pruned) == Map(1L -> 10.0, 2L -> 20.0))
    val sf = scannedFiles(pruned)
    assert(sf.size == 1 && sf.forall(_.contains("/p1/")),
      s"identity predicate did not prune: $sf")
    // mixed predicate prunes on its identity conjunct and still
    // row-filters the rest
    val mixed = IcebergInterop.readIceberg(spark, dir,
      where = Some("p = 2 AND amount > 35"))
    assert(state(mixed) == Map(4L -> 40.0))
    assert(scannedFiles(mixed).forall(_.contains("/p2/")))
    // a conjunct over a non-partition column prunes on the manifest
    // COLUMN BOUNDS (k in [1,2] for the p1 file, [3,4] for p2) —
    // file skipping beyond partition pruning, values unchanged
    val byK = IcebergInterop.readIceberg(spark, dir,
      where = Some("k >= 4"))
    assert(state(byK) == Map(4L -> 40.0))
    val sk = scannedFiles(byK)
    assert(sk.size == 1 && sk.forall(_.contains("/p2/")),
      s"bounds pruning failed: $sk")
    // a bound-covered but value-absent predicate keeps the covering
    // file (bounds are intervals, not membership) and row-filters
    val byK2 = IcebergInterop.readIceberg(spark, dir,
      where = Some("k = 2"))
    assert(state(byK2) == Map(2L -> 20.0))
    assert(scannedFiles(byK2).size == 1)
    // the DataFrameReader shim exposes the same pruning via
    // option("filter", ...)
    val viaShim = spark.read.format("graft-iceberg")
      .option("path", dir).option("filter", "p = 1").load()
    assert(viaShim.select("k", "amount").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap ==
      Map(1L -> 10.0, 2L -> 20.0))
  }

  test("a MISSING v2 export state next to committed metadata " +
      "self-heals on our OWN lineage (deterministic table-uuid) — " +
      "the old delete-then-rename crash window no longer bricks the " +
      "export — while a foreign tree still refuses") {
    import spark.implicits._
    val root = buildCdc()
    val ice = tmp("icev2_lost_state")
    IcebergV2.exportIncremental(spark, root, ice)
    assert(CdcApply.applyBatch(
      Seq((1L, 2L, 11.0, false)).toDF("k", "version", "amount", "deleted"),
      1L, root, Seq("k"), "version", Some("deleted"), numBuckets = 2,
      commitTs = Some(2000L)))
    IcebergV2.exportIncremental(spark, root, ice)
    val good = state(IcebergInterop.readIceberg(spark, ice))
    def dropState(dir: String): Unit = {
      assert(new java.io.File(dir, "_graft_export_state.json").delete())
      new java.io.File(dir, "._graft_export_state.json.crc").delete()
    }
    dropState(ice)
    // exportIncremental self-heals with a full rewrite
    assert(IcebergV2.exportIncremental(spark, root, ice).contains(2L))
    assert(state(IcebergInterop.readIceberg(spark, ice)) == good)
    assert(IcebergV2.deleteFileStats(spark, ice) == (0, 0L))
    // compact survives state loss too (a full rewrite needs no state)
    dropState(ice)
    assert(IcebergV2.compact(spark, root, ice) == 3L)
    assert(state(IcebergInterop.readIceberg(spark, ice)) == good)
    // the same tree at a DIFFERENT path has a mismatched table-uuid —
    // exactly a foreign writer's shape — and refuses loudly
    val foreign = tmp("icev2_foreign_tree")
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(ice), new java.io.File(foreign))
    dropState(foreign)
    val e = intercept[IllegalStateException] {
      IcebergV2.exportIncremental(spark, root, foreign)
    }
    assert(e.getMessage.contains("foreign writer"), e.getMessage)
    val e2 = intercept[IllegalStateException] {
      IcebergV2.compact(spark, root, foreign)
    }
    assert(e2.getMessage.contains("lineage"), e2.getMessage)
  }
}
