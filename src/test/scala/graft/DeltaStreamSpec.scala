package graft

import org.scalatest.funsuite.AnyFunSuite

/** Streaming tail of a FOREIGN Delta log
  * (`spark.readStream.format("graft-delta")`): offset = log version,
  * first batch = live snapshot at stream start, later batches =
  * exactly the new versions' adds; a checkpointed restart resumes at
  * the recorded version (appends arrive exactly once by version);
  * non-append tails (removes, DV adds) refuse loudly.
  */
class DeltaStreamSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(p: String): String = java.nio.file.Files
    .createTempDirectory(p).toFile.getAbsolutePath

  private def writeFile(dir: String, sub: String,
      rows: Seq[(Long, String)]): String = {
    val spark2 = spark
    import spark2.implicits._
    rows.toDF("id", "s").coalesce(1).write.parquet(s"$dir/$sub")
    val f = new java.io.File(s"$dir/$sub").listFiles()
      .map(_.getName).find(_.endsWith(".parquet")).get
    s"$sub/$f"
  }

  private def schemaJson: String = {
    val spark2 = spark
    import spark2.implicits._
    Seq((1L, "a")).toDF("id", "s").schema.json
      .replace("\\", "\\\\").replace("\"", "\\\"")
  }

  private def commit(dir: String, v: Long, body: String): Unit = {
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$dir/_delta_log"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(
      f"$dir/_delta_log/$v%020d.json"), body)
  }

  private def addLine(rel: String): String =
    s"""{"add":{"path":"$rel","size":1,"partitionValues":{},"modificationTime":0,"dataChange":true}}"""

  test("appends arrive EXACTLY ONCE BY VERSION: snapshot first, then " +
      "per-version adds; a checkpointed restart resumes with no " +
      "duplicates") {
    val dir = tmp("dstream")
    val ckpt = tmp("dstream_ckpt")
    val f0 = writeFile(dir, "a", Seq((1L, "a"), (2L, "b")))
    commit(dir, 0L,
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
{"metaData":{"id":"x","schemaString":"$schemaJson","format":{"provider":"parquet","options":{}},"partitionColumns":[],"configuration":{}}}
${addLine(f0)}
""")
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Seq[Long])]()
    def start() = spark.readStream.format("graft-delta")
      .option("path", dir).load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        batches.add((id,
          df.select("id").collect().map(_.getLong(0)).toSeq))
        ()
      }.start()
    val q = start()
    try {
      q.processAllAvailable()
      // snapshot batch: the full live state at stream start
      val seen0 = {
        import scala.jdk.CollectionConverters._
        batches.asScala.flatMap(_._2).toSeq.sorted
      }
      assert(seen0 == Seq(1L, 2L), s"snapshot batch wrong: $seen0")
      // two more commits while the stream runs
      val f1 = writeFile(dir, "b", Seq((3L, "c")))
      commit(dir, 1L, addLine(f1) + "\n")
      q.processAllAvailable()
      val f2 = writeFile(dir, "c", Seq((4L, "d")))
      commit(dir, 2L, addLine(f2) + "\n")
      q.processAllAvailable()
      val all = {
        import scala.jdk.CollectionConverters._
        batches.asScala.flatMap(_._2).toSeq.sorted
      }
      assert(all == Seq(1L, 2L, 3L, 4L),
        s"tail adds wrong or duplicated: $all")
    } finally q.stop()
    // checkpointed RESTART: nothing re-delivered, new appends arrive
    batches.clear()
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(batches.isEmpty,
        s"restart re-delivered: ${batches.toArray.mkString(",")}")
      val f3 = writeFile(dir, "d", Seq((5L, "e")))
      commit(dir, 3L, addLine(f3) + "\n")
      q2.processAllAvailable()
      val fresh = {
        import scala.jdk.CollectionConverters._
        batches.asScala.flatMap(_._2).toSeq.sorted
      }
      assert(fresh == Seq(5L), s"post-restart append wrong: $fresh")
    } finally q2.stop()
  }

  test("PARTITIONED tail adds reconstruct partition columns from " +
      "partitionValues; a non-append commit (remove) refuses loudly " +
      "mid-stream") {
    val spark2 = spark
    import spark2.implicits._
    val dir = tmp("dstream_part")
    val ckpt = tmp("dstream_part_ckpt")
    // partitioned layout: data files omit the partition column
    def writePart(sub: String, rows: Seq[(Long, Double)]): String = {
      rows.toDF("id", "amount").coalesce(1)
        .write.parquet(s"$dir/$sub")
      val f = new java.io.File(s"$dir/$sub").listFiles()
        .map(_.getName).find(_.endsWith(".parquet")).get
      s"$sub/$f"
    }
    val schema = Seq((1L, 10.0, "x")).toDF("id", "amount", "region")
      .schema.json.replace("\\", "\\\\").replace("\"", "\\\"")
    val fA = writePart("region=APAC", Seq((1L, 10.0)))
    commit(dir, 0L,
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
{"metaData":{"id":"x","schemaString":"$schema","format":{"provider":"parquet","options":{}},"partitionColumns":["region"],"configuration":{}}}
{"add":{"path":"$fA","size":1,"partitionValues":{"region":"APAC"},"modificationTime":0,"dataChange":true}}
""")
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, String)]()
    val q = spark.readStream.format("graft-delta")
      .option("path", dir).load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("id", "region").collect()
          .foreach(r => rows.add((r.getLong(0), r.getString(1))))
        ()
      }.start()
    try {
      q.processAllAvailable()
      val fE = writePart("region=EMEA", Seq((2L, 20.0)))
      commit(dir, 1L,
        s"""{"add":{"path":"$fE","size":1,"partitionValues":{"region":"EMEA"},"modificationTime":0,"dataChange":true}}
""")
      q.processAllAvailable()
      val got = {
        import scala.jdk.CollectionConverters._
        rows.asScala.toSet
      }
      assert(got == Set(1L -> "APAC", 2L -> "EMEA"), s"$got")
      // a REMOVE under the running stream refuses loudly
      commit(dir, 2L,
        s"""{"remove":{"path":"$fA","dataChange":true}}
""")
      val e = intercept[Exception] { q.processAllAvailable() }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("append")), s"$e")
    } finally q.stop()
  }

  test("column-mapped tables refuse STREAMING up front, by name") {
    val dir = tmp("dstream_cm")
    val f0 = writeFile(dir, "a", Seq((1L, "a")))
    commit(dir, 0L,
      s"""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}
{"metaData":{"id":"x","schemaString":"$schemaJson","format":{"provider":"parquet","options":{}},"partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name"}}}
${addLine(f0)}
""")
    val e = intercept[UnsupportedOperationException] {
      spark.readStream.format("graft-delta").option("path", dir).load()
    }
    assert(e.getMessage.contains("column mapping"), e.getMessage)
  }
}
