package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter,
  GenericRecord}

import graft.sources.DeltaInterop

/** Enclosing-query predicate pushdown into foreign-scan FILE PRUNING
  * ([[graft.plans.ForeignScanPrune]]): a SQL `WHERE` over
  * `delta_scan(...)` / `iceberg_scan(...)` must reach the protocol
  * readers' metadata-level pruning (add-action stats, partition
  * values, Iceberg manifest bounds) exactly like a Scala
  * `option("filter", ...)` caller — values unchanged, physical file
  * set a strict subset. Plus `delta_scan_ts` / `timestampAsOf`
  * (TIMESTAMP AS OF over a foreign Delta log).
  */
class ForeignScanPruneSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(p: String): String = java.nio.file.Files
    .createTempDirectory(p).toFile.getAbsolutePath

  /** Parquet files the FINAL physical plan actually scans. */
  private def scanned(df: org.apache.spark.sql.DataFrame)
      : Set[String] = {
    df.collect() // finalize any adaptive plan before inspecting
    df.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.toPartitionArray
          .map(_.filePath.toString).toSeq
    }.flatten.toSet
  }

  // ---- Delta fixture: 3 files with disjoint id stats ----------------------

  private def buildStatsDelta(): String = {
    import java.nio.file.{Files, Paths}
    val spark2 = spark
    import spark2.implicits._
    val delta = tmp("fsp_delta")
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
    delta
  }

  test("SQL WHERE over delta_scan prunes on add-action STATS: " +
      "strict file subset, values identical to the unpruned read") {
    val delta = buildStatsDelta()
    val all = spark.sql(s"SELECT * FROM delta_scan('$delta')")
    assert(scanned(all).size == 3)
    // range predicate: only the [10,20] file can match
    val mid = spark.sql(
      s"SELECT id FROM delta_scan('$delta') WHERE id >= 10 AND id < 25")
    assert(mid.collect().map(_.getLong(0)).toSet == Set(10L, 20L))
    val sMid = scanned(mid)
    assert(sMid.size == 1 && sMid.forall(_.contains("/b/")),
      s"SQL predicate did not reach file pruning: $sMid")
    // equality
    val eq = spark.sql(
      s"SELECT id, s FROM delta_scan('$delta') WHERE id = 30")
    assert(eq.collect().map(_.getLong(0)).toSet == Set(30L))
    assert(scanned(eq).forall(_.contains("/c/")))
    // an unprunable shape (LIKE) keeps every file but still filters
    val like = spark.sql(
      s"SELECT id FROM delta_scan('$delta') WHERE s LIKE 'c%'")
    assert(like.collect().map(_.getLong(0)).toSet == Set(10L))
    assert(scanned(like).size == 3)
    // mixed: prunable conjunct prunes, the rest row-filters
    val mixed = spark.sql(s"SELECT id FROM delta_scan('$delta') " +
      "WHERE id >= 10 AND id < 25 AND s LIKE 'd%'")
    assert(mixed.collect().map(_.getLong(0)).toSet == Set(20L))
    assert(scanned(mixed).size == 1)
    // predicates arriving through a JOIN's WHERE prune each side
    val joined = spark.sql(
      s"""SELECT a.id FROM delta_scan('$delta') a
         |JOIN delta_scan('$delta') b ON a.id = b.id
         |WHERE a.id >= 30 AND b.id >= 30""".stripMargin)
    assert(joined.collect().map(_.getLong(0)).toSet == Set(30L))
    assert(scanned(joined).forall(_.contains("/c/")),
      s"join-side predicates not pruned: ${scanned(joined)}")
  }

  test("IN-list predicates prune as a disjunction of equalities: " +
      "stats intervals keep only files covering SOME member; an " +
      "all-miss list scans nothing; values unchanged") {
    val delta = buildStatsDelta()
    // members land in files b [10,20] and c [30,30]
    val two = spark.sql(
      s"SELECT id FROM delta_scan('$delta') WHERE id IN (12, 30)")
    assert(two.collect().map(_.getLong(0)).toSet == Set(30L))
    val sTwo = scanned(two)
    assert(sTwo.size == 2 && sTwo.forall(p =>
      p.contains("/b/") || p.contains("/c/")),
      s"IN-list did not prune to covering files: $sTwo")
    // no member falls in any interval: every file pruned, no scan
    val none = spark.sql(
      s"SELECT id FROM delta_scan('$delta') WHERE id IN (6, 7)")
    assert(none.collect().isEmpty)
    assert(scanned(none).isEmpty, s"all-miss IN still scanned: " +
      s"${scanned(none)}")
    // present members return, absent covered members row-filter away
    val hit = spark.sql(
      s"SELECT id FROM delta_scan('$delta') WHERE id IN (10, 20, 25)")
    assert(hit.collect().map(_.getLong(0)).toSet == Set(10L, 20L))
    assert(scanned(hit).size == 1)
  }

  test("SQL WHERE over a PARTITIONED delta_scan cuts the file list " +
      "on partition values before any scan") {
    import java.nio.file.{Files, Paths}
    val spark2 = spark
    import spark2.implicits._
    val delta = tmp("fsp_delta_part")
    // partitioned layout: data files OMIT the partition column
    def writeGroup(sub: String, rows: Seq[(Long, Double)]): String = {
      rows.toDF("id", "amount").coalesce(1)
        .write.parquet(s"$delta/$sub")
      val f = new java.io.File(s"$delta/$sub").listFiles()
        .map(_.getName).find(_.endsWith(".parquet")).get
      s"$sub/$f"
    }
    val fA = writeGroup("region=APAC", Seq((1L, 10.0), (2L, 20.0)))
    val fE = writeGroup("region=EMEA", Seq((3L, 30.0)))
    val schema = Seq((1L, 10.0, "x")).toDF("id", "amount", "region")
      .schema.json.replace("\\", "\\\\").replace("\"", "\\\"")
    Files.createDirectories(Paths.get(s"$delta/_delta_log"))
    Files.writeString(Paths.get(
      s"$delta/_delta_log/00000000000000000000.json"),
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
{"metaData":{"id":"x","schemaString":"$schema","format":{"provider":"parquet","options":{}},"partitionColumns":["region"],"configuration":{}}}
{"add":{"path":"$fA","size":1,"partitionValues":{"region":"APAC"},"modificationTime":0,"dataChange":true}}
{"add":{"path":"$fE","size":1,"partitionValues":{"region":"EMEA"},"modificationTime":0,"dataChange":true}}
""")
    val all = spark.sql(s"SELECT * FROM delta_scan('$delta')")
    assert(scanned(all).size == 2)
    val apac = spark.sql(s"SELECT id, amount FROM delta_scan" +
      s"('$delta') WHERE region = 'APAC'")
    assert(apac.collect().map(r => r.getLong(0) -> r.getDouble(1))
      .toMap == Map(1L -> 10.0, 2L -> 20.0))
    val sA = scanned(apac)
    assert(sA.size == 1 && sA.forall(_.contains("region=APAC")),
      s"partition predicate did not cut the file list: $sA")
  }

  // ---- Iceberg fixture: identity-partitioned v2 tree with k bounds --------

  private def buildIceberg(): String = {
    import org.apache.spark.sql.types._
    val dir = tmp("fsp_ice")
    new java.io.File(dir, "metadata").mkdirs()
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
    val f1 = writeData("p1", Seq(
      org.apache.spark.sql.Row(1L, 10.0, 1),
      org.apache.spark.sql.Row(2L, 20.0, 1)))
    val f2 = writeData("p2", Seq(
      org.apache.spark.sql.Row(3L, 30.0, 2),
      org.apache.spark.sql.Row(4L, 40.0, 2)))
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
      df.put("file_path", s"file:$path")
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
         |{"name":"p","transform":"identity","source-id":3,"field-id":1000}]}],
         |"current-snapshot-id":0,"snapshots":[{"snapshot-id":0,
         |"sequence-number":1,
         |"manifest-list":"$dir/metadata/snap-0.avro"}]}"""
        .stripMargin.replace("\n", ""))
    dir
  }

  test("SQL WHERE over iceberg_scan prunes on manifest PARTITION " +
      "values and COLUMN BOUNDS: strict file subset, values " +
      "unchanged") {
    val dir = buildIceberg()
    val all = spark.sql(s"SELECT * FROM iceberg_scan('$dir')")
    assert(all.collect().length == 4)
    assert(scanned(all).size == 2)
    // identity-partition predicate from SQL
    val p1 = spark.sql(
      s"SELECT k, amount FROM iceberg_scan('$dir') WHERE p = 1")
    assert(p1.collect().map(r => r.getLong(0) -> r.getDouble(1))
      .toMap == Map(1L -> 10.0, 2L -> 20.0))
    val s1 = scanned(p1)
    assert(s1.size == 1 && s1.forall(_.contains("/p1/")),
      s"iceberg partition predicate did not prune: $s1")
    // column-bounds predicate from SQL (k in [1,2] / [3,4])
    val byK = spark.sql(
      s"SELECT k FROM iceberg_scan('$dir') WHERE k >= 4")
    assert(byK.collect().map(_.getLong(0)).toSet == Set(4L))
    val sk = scanned(byK)
    assert(sk.size == 1 && sk.forall(_.contains("/p2/")),
      s"iceberg bounds predicate did not prune: $sk")
  }

  // ---- delta_scan_ts / timestampAsOf ---------------------------------------

  test("TIMESTAMP AS OF over a foreign Delta log: commit-file " +
      "modification times (monotonicity-repaired), inCommitTimestamp " +
      "when present, latest-at-or-before semantics, refusal before " +
      "the first commit") {
    import java.nio.file.{Files, Paths}
    val spark2 = spark
    import spark2.implicits._
    val delta = tmp("fsp_delta_ts")
    def writeGroup(sub: String, rows: Seq[(Long, String)]): String = {
      rows.toDF("id", "s").coalesce(1).write.parquet(s"$delta/$sub")
      val f = new java.io.File(s"$delta/$sub").listFiles()
        .map(_.getName).find(_.endsWith(".parquet")).get
      s"$sub/$f"
    }
    val f0 = writeGroup("a", Seq((1L, "a")))
    val f1 = writeGroup("b", Seq((2L, "b")))
    val f2 = writeGroup("c", Seq((3L, "c")))
    val schema = Seq((1L, "a")).toDF("id", "s").schema.json
      .replace("\\", "\\\\").replace("\"", "\\\"")
    Files.createDirectories(Paths.get(s"$delta/_delta_log"))
    def commit(v: Long, body: String, modTime: Long): Unit = {
      val p = Paths.get(s"$delta/_delta_log/" + f"$v%020d.json")
      Files.writeString(p, body)
      assert(p.toFile.setLastModified(modTime))
    }
    commit(0L,
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
{"metaData":{"id":"x","schemaString":"$schema","format":{"provider":"parquet","options":{}},"partitionColumns":[],"configuration":{}}}
{"add":{"path":"$f0","size":1,"partitionValues":{},"modificationTime":0,"dataChange":true}}
""", 100000L)
    // CLOCK SKEW: v1's file time is EARLIER than v0's — the reader's
    // monotonic repair must place it at 100001, not 60000
    commit(1L,
      s"""{"add":{"path":"$f1","size":1,"partitionValues":{},"modificationTime":0,"dataChange":true}}
""", 60000L)
    // v2 carries an authoritative inCommitTimestamp (file time lies)
    commit(2L,
      s"""{"commitInfo":{"inCommitTimestamp":500000}}
{"add":{"path":"$f2","size":1,"partitionValues":{},"modificationTime":0,"dataChange":true}}
""", 900000L)
    def idsAt(tsMillis: Long): Set[Long] =
      DeltaInterop.readDelta(spark, delta,
        timestampAsOf = Some(tsMillis))
        .select("id").collect().map(_.getLong(0)).toSet
    assert(idsAt(100000L) == Set(1L))          // exactly v0
    assert(idsAt(100001L) == Set(1L, 2L))      // v1 after repair
    assert(idsAt(400000L) == Set(1L, 2L))      // between v1 and v2
    assert(idsAt(500000L) == Set(1L, 2L, 3L))  // v2 by inCommitTimestamp
    assert(idsAt(2000000L) == Set(1L, 2L, 3L)) // past the head
    val e = intercept[IllegalArgumentException] { idsAt(99999L) }
    assert(e.getMessage.contains("before the first available commit"),
      e.getMessage)
    // the SQL surface: delta_scan_ts with a deterministic UTC instant
    def sqlIds(ts: String): Set[Long] =
      spark.sql(s"SELECT id FROM delta_scan_ts('$delta', '$ts')")
        .collect().map(_.getLong(0)).toSet
    assert(sqlIds("1970-01-01T00:01:40Z") == Set(1L))       // 100000ms
    assert(sqlIds("1970-01-01 00:06:40") == Set(1L, 2L))    // 400000ms
    assert(sqlIds("1970-01-01T00:08:20Z") == Set(1L, 2L, 3L)) // 500000ms
    // the DataFrameReader shim: epoch millis or instant strings
    assert(spark.read.format("graft-delta").option("path", delta)
      .option("timestampAsOf", "400000").load()
      .select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(spark.read.format("graft-delta").option("path", delta)
      .option("timestampAsOf", "1970-01-01T00:08:20Z").load()
      .select("id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 3L))
    // versionAsOf and timestampAsOf together refuse
    val both = intercept[IllegalArgumentException] {
      DeltaInterop.readDelta(spark, delta, Some(1L),
        timestampAsOf = Some(400000L))
    }
    assert(both.getMessage.contains("mutually exclusive"))
    // pruning composes with time travel: WHERE through delta_scan_ts
    val pruned = spark.sql(s"SELECT id FROM delta_scan_ts('$delta', " +
      "'1970-01-01T00:08:20Z') WHERE id >= 3")
    assert(pruned.collect().map(_.getLong(0)).toSet == Set(3L))
  }
}
