package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{Sinks, Tables}

class SinksAndSourcesSpec extends AnyFunSuite with SparkTestBase {

  test("CSV sink round-trips a result set with schema intact") {
    import spark.implicits._
    val df = Seq(("APAC", 8L), ("EMEA", 6L), ("AMER", 6L))
      .toDF("sales_region", "cnt")
    val path = java.nio.file.Files
      .createTempDirectory("csv_test").toFile.getAbsolutePath + "/out"
    Sinks.writeCsv(df, path)
    // exactly one part file, with a header line
    val parts = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".csv"))
    assert(parts.length == 1)
    val lines = scala.io.Source.fromFile(parts.head).getLines().toSeq
    assert(lines.head == "sales_region,cnt")
    val back = Sinks.readCsv(spark, path, StructType(Seq(
      StructField("sales_region", StringType),
      StructField("cnt", LongType))))
    assert(back.schema("cnt").dataType == LongType)
    assert(back.collect().map(_.toSeq).toSet ==
      df.collect().map(_.toSeq).toSet)
  }

  test("q_csv_sink query matches the direct aggregation") {
    val viaCsv = graft.queries.TierA.queries("q_csv_sink")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(viaCsv == Seq(Seq("AMER", 6L), Seq("APAC", 8L), Seq("EMEA", 6L)))
  }

  test("JSONL round-trips losslessly; declared schema handles absent fields") {
    import spark.implicits._
    val df = Seq((1L, "en", 10L), (2L, "fr", 20L))
      .toDF("doc_id", "lang", "n_chars")
    val path = java.nio.file.Files.createTempDirectory("jsonl_test")
      .toFile.getAbsolutePath + "/out"
    graft.sources.Sinks.writeJsonl(df, path)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("n_chars", LongType)))
    val back = graft.sources.Sinks.readJsonl(spark, path, schema)
    assert(back.collect().map(_.toSeq).toSet ==
      df.collect().map(_.toSeq).toSet)
    // a field absent from the files reads as NULL under a declared
    // schema (inference would silently shape-shift instead)
    val wider = StructType(schema.fields :+ StructField("source", StringType))
    val rows = graft.sources.Sinks.readJsonl(spark, path, wider).collect()
    assert(rows.length == 2)
    assert(rows.forall(_.isNullAt(3)))
  }

  test("streaming JSONL ingest dedupes across file batches end-to-end") {
    // the full ingest front door: files land in a directory → streaming
    // JSONL source (declared schema, bounded files/trigger) → streaming
    // exact dedup (watermark-bounded state) → append sink. The duplicate
    // in the SECOND landed file must be dropped against state built from
    // the FIRST — cross-micro-batch dedup, the property a per-batch
    // distinct cannot give.
    val dir = java.nio.file.Files
      .createTempDirectory("jsonl_ingest").toFile
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("ts", TimestampType)))
    def land(name: String, lines: Seq[String]): Unit = {
      val f = new java.io.File(dir, name)
      java.nio.file.Files.write(f.toPath,
        lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    }
    land("batch1.jsonl", Seq(
      """{"doc_id":1,"text":"alpha","ts":"2024-01-01T00:00:00Z"}""",
      """{"doc_id":2,"text":"beta","ts":"2024-01-01T00:05:00Z"}"""))
    val src = Sinks.readJsonlStream(spark, dir.getAbsolutePath, schema,
      maxFilesPerTrigger = 1)
    assert(src.isStreaming)
    val q = graft.dedup.Dedup.exactStreaming(src, "text", "ts", "1 hour")
      .select(col("doc_id"), col("text"))
      .writeStream.format("memory").queryName("jsonl_ingest")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      land("batch2.jsonl", Seq(
        // same content as doc 1, well inside the watermark delay → drop
        """{"doc_id":3,"text":"alpha","ts":"2024-01-01T00:10:00Z"}""",
        """{"doc_id":4,"text":"gamma","ts":"2024-01-01T00:15:00Z"}"""))
      q.processAllAvailable()
      val got = spark.table("jsonl_ingest").collect()
        .map(r => r.getAs[Long]("doc_id")).toSet
      assert(got == Set(1L, 2L, 4L),
        s"expected dup doc 3 dropped across batches, got $got")
    } finally q.stop()
  }

  test("ORC round-trips losslessly with predicate pushdown in the scan") {
    val tmp = java.nio.file.Files
      .createTempDirectory("orc_test").toFile.getAbsolutePath + "/docs"
    val src = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    Sinks.writeOrc(src, tmp)
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("lang", StringType),
      StructField("n_chars", LongType)))
    val back = Sinks.readOrc(spark, tmp, schema)
    assert(back.collect().map(_.toSeq).toSet ==
      src.collect().map(_.toSeq).toSet)
    // the filter must reach the ORC scan as a pushed predicate, and the
    // projection must prune the read schema — same contract as parquet
    val q = back.filter(col("doc_id") < 50).select("doc_id", "lang")
    val scan = q.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.metadata("PushedFilters").contains("LessThan(doc_id,50)"),
      s"filter not pushed to ORC scan: ${scan.metadata("PushedFilters")}")
    assert(!scan.schema.fieldNames.contains("n_chars"),
      s"read schema not pruned: ${scan.schema.fieldNames.mkString(",")}")
  }

  test("compaction collapses small files, size-derived, content intact") {
    val tmp = java.nio.file.Files
      .createTempDirectory("compact_test").toFile.getAbsolutePath
    val src = Tables.documents(spark, sfDir)
    src.repartition(40).write.parquet(s"$tmp/landing")
    val smallFiles = new java.io.File(s"$tmp/landing").listFiles
      .count(_.getName.endsWith(".parquet"))
    assert(smallFiles >= 30, s"setup produced only $smallFiles files")
    // huge target => everything fits one file
    val out = graft.sources.Sinks.compactParquet(spark, s"$tmp/landing",
      s"$tmp/compacted", targetBytes = 1L << 30)
    val bigFiles = new java.io.File(s"$tmp/compacted").listFiles
      .count(_.getName.endsWith(".parquet"))
    assert(bigFiles == 1, s"expected 1 compacted file, got $bigFiles")
    assert(out.count() == src.count())
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      src.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    // small target => multiple output files, ceil(bytes/target)
    val sz = new java.io.File(s"$tmp/landing").listFiles
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val target = sz / 3
    val out2 = graft.sources.Sinks.compactParquet(spark, s"$tmp/landing",
      s"$tmp/compacted2", targetBytes = target)
    val n2 = new java.io.File(s"$tmp/compacted2").listFiles
      .count(_.getName.endsWith(".parquet"))
    assert(n2 >= 2 && n2 < smallFiles, s"expected 2..<$smallFiles, got $n2")
    assert(out2.count() == src.count())
  }

  test("schema drift on a testdata table fails loudly at the read") {
    // every declared table reads clean against its asserted schema
    Tables.all.foreach(t => Tables.table(spark, sfDir, t))
    // a wrong type on a declared column is drift, not a silent coercion
    val badType = StructType(Tables.schemas("documents").fields.map {
      case f if f.name == "n_chars" => f.copy(dataType = StringType)
      case f => f
    })
    val e1 = intercept[IllegalArgumentException] {
      Tables.assertSchema("documents", badType)
    }
    assert(e1.getMessage.contains("schema drift") &&
      e1.getMessage.contains("documents"))
    // a dropped column is drift too
    val dropped = StructType(Tables.schemas("events").fields
      .filterNot(_.name == "props"))
    intercept[IllegalArgumentException] {
      Tables.assertSchema("events", dropped)
    }
    // timestamp-kind flexibility is config, not drift: ts as NTZ is fine
    val ntzTs = StructType(Tables.schemas("events").fields.map {
      case f if f.name == "ts" => f.copy(dataType = TimestampNTZType)
      case f => f
    })
    Tables.assertSchema("events", ntzTs)
  }

  test("events date partitioning prunes partitions in the plan") {
    val df = Tables.eventsByDate(spark, sfDir)
      .filter(col("event_date") === lit("2024-01-15").cast("date"))
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters"),
      s"no partition filters in plan:\n$physical")
    assert(physical.contains("event_date"),
      "partition column missing from filters")
    // pruned scan reads a single partition directory
    val scanned = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(!scanned.contains("PushedFilters: [IsNotNull(event_date"),
      "date predicate should prune partitions, not push as a data filter")
  }

  test("partition-pruned results equal filtering the unpartitioned table") {
    val pruned = graft.queries.TierC.queries("q_partition_prune")(
      spark, sfDir).collect().map(_.toSeq).toSeq
    val direct = Tables.events(spark, sfDir)
      .filter(to_date(col("ts")) === lit("2024-01-15").cast("date"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType)
          .as("total_value"))
      .orderBy(col("event_type")).collect().map(_.toSeq).toSeq
    assert(pruned == direct)
    assert(pruned.nonEmpty)
  }
}
