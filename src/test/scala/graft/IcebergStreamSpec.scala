package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter,
  GenericRecord}

/** Streaming tail of an Iceberg tree
  * (`spark.readStream.format("graft-iceberg")`): offset = metadata
  * version, first batch = the snapshot current at stream start,
  * later batches = exactly the data files new commits ADD;
  * checkpointed restarts resume at the recorded metadata version;
  * non-append commits (file removals) refuse loudly.
  */
class IcebergStreamSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(p: String): String = java.nio.file.Files
    .createTempDirectory(p).toFile.getAbsolutePath

  private val entrySchema = new org.apache.avro.Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int","field-id":0},
      |{"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
      |{"name":"file_path","type":"string","field-id":100},
      |{"name":"file_format","type":"string","field-id":101},
      |{"name":"record_count","type":"long","field-id":103},
      |{"name":"file_size_in_bytes","type":"long","field-id":104}
      |]}}]}""".stripMargin)

  private val listSchema = new org.apache.avro.Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string","field-id":500},
      |{"name":"manifest_length","type":"long","field-id":501}
      |]}""".stripMargin)

  private def writeDataFile(dir: String, sub: String,
      rows: Seq[(Long, String)]): String = {
    val spark2 = spark
    import spark2.implicits._
    rows.toDF("id", "s").coalesce(1).write.parquet(s"$dir/data/$sub")
    new java.io.File(s"$dir/data/$sub").listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
  }

  private def writeManifest(dir: String, name: String,
      paths: Seq[String]): Unit = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](entrySchema))
    w.create(entrySchema, new java.io.FileOutputStream(
      new java.io.File(dir, s"metadata/$name")))
    paths.foreach { p =>
      val df = new GenericData.Record(
        entrySchema.getField("data_file").schema())
      df.put("file_path", s"file:$p")
      df.put("file_format", "PARQUET")
      df.put("record_count", 1L)
      df.put("file_size_in_bytes", 1L)
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1)
      e.put("data_file", df)
      w.append(e)
    }
    w.close()
  }

  private def writeList(dir: String, name: String,
      manifests: Seq[String]): Unit = {
    val lw = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](listSchema))
    lw.create(listSchema, new java.io.FileOutputStream(
      new java.io.File(dir, s"metadata/$name")))
    manifests.foreach { n =>
      val r = new GenericData.Record(listSchema)
      r.put("manifest_path", s"metadata/$n")
      r.put("manifest_length", 1L)
      lw.append(r)
    }
    lw.close()
  }

  private def writeMeta(dir: String, v: Long,
      snaps: Seq[(Long, String)], current: Long): Unit = {
    val snapJson = snaps.map { case (id, list) =>
      s"""{"snapshot-id":$id,"timestamp-ms":$id,
         |"manifest-list":"$dir/metadata/$list"}"""
        .stripMargin.replace("\n", "")
    }.mkString(",")
    java.nio.file.Files.writeString(new java.io.File(dir,
      s"metadata/v$v.metadata.json").toPath,
      s"""{"format-version":1,
         |"current-schema-id":0,"schemas":[{"type":"struct",
         |"schema-id":0,"fields":[
         |{"id":1,"name":"id","required":false,"type":"long"},
         |{"id":2,"name":"s","required":false,"type":"string"}]}],
         |"current-snapshot-id":$current,
         |"snapshots":[$snapJson]}""".stripMargin.replace("\n", ""))
  }

  test("appends arrive exactly once by METADATA VERSION: snapshot " +
      "first, then per-commit adds; checkpointed restart resumes; a " +
      "file-removing commit refuses loudly") {
    val dir = tmp("icestream")
    val ckpt = tmp("icestream_ckpt")
    new java.io.File(dir, "metadata").mkdirs()
    val f1 = writeDataFile(dir, "g1", Seq((1L, "a"), (2L, "b")))
    writeManifest(dir, "m-0.avro", Seq(f1))
    writeList(dir, "snap-0.avro", Seq("m-0.avro"))
    writeMeta(dir, 0L, Seq((0L, "snap-0.avro")), 0L)
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[
      Seq[Long]]()
    def start() = spark.readStream.format("graft-iceberg")
      .option("path", dir).load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.add(df.select("id").collect().map(_.getLong(0)).toSeq)
        ()
      }.start()
    def all(): Seq[Long] = {
      import scala.jdk.CollectionConverters._
      batches.asScala.flatten.toSeq.sorted
    }
    val q = start()
    try {
      q.processAllAvailable()
      assert(all() == Seq(1L, 2L), s"snapshot batch wrong: ${all()}")
      // commit 1: a new snapshot adds f2 (manifests carry forward)
      val f2 = writeDataFile(dir, "g2", Seq((3L, "c")))
      writeManifest(dir, "m-1.avro", Seq(f2))
      writeList(dir, "snap-1.avro", Seq("m-0.avro", "m-1.avro"))
      writeMeta(dir, 1L,
        Seq((0L, "snap-0.avro"), (1L, "snap-1.avro")), 1L)
      q.processAllAvailable()
      assert(all() == Seq(1L, 2L, 3L), s"tail add wrong: ${all()}")
    } finally q.stop()
    // restart: nothing re-delivered; a new commit arrives once
    batches.clear()
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(batches.isEmpty,
        s"restart re-delivered: ${all()}")
      val f3 = writeDataFile(dir, "g3", Seq((4L, "d")))
      writeManifest(dir, "m-2.avro", Seq(f3))
      writeList(dir, "snap-2.avro",
        Seq("m-0.avro", "m-1.avro", "m-2.avro"))
      writeMeta(dir, 2L, Seq((0L, "snap-0.avro"),
        (1L, "snap-1.avro"), (2L, "snap-2.avro")), 2L)
      q2.processAllAvailable()
      assert(all() == Seq(4L), s"post-restart add wrong: ${all()}")
      // a commit whose current snapshot DROPS f1 is not append-shaped
      writeList(dir, "snap-3.avro", Seq("m-1.avro", "m-2.avro"))
      writeMeta(dir, 3L, Seq((0L, "snap-0.avro"),
        (1L, "snap-1.avro"), (2L, "snap-2.avro"),
        (3L, "snap-3.avro")), 3L)
      val e = intercept[Exception] { q2.processAllAvailable() }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("append")), s"$e")
    } finally q2.stop()
  }
}
