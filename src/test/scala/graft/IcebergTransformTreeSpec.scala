package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter,
  GenericRecord}

import graft.sources.IcebergInterop

/** NON-IDENTITY transform pruning over a hand-built foreign Iceberg
  * tree partitioned by `bucket[8](k)`, `day(ts)`, `truncate[2](s)`:
  * equality conjuncts prune bucketed files, range conjuncts prune
  * temporal/truncate files (monotonic transforms), range conjuncts
  * over the BUCKET keep everything (hashing destroys order), and
  * values always equal filter-after-read.
  */
class IcebergTransformTreeSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(p: String): String = java.nio.file.Files
    .createTempDirectory(p).toFile.getAbsolutePath

  private def scanned(df: org.apache.spark.sql.DataFrame)
      : Set[String] = {
    df.collect()
    df.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.toPartitionArray
          .map(_.filePath.toString).toSeq
    }.flatten.toSet
  }

  private def utcTs(s: String): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.LocalDateTime
      .parse(s).toInstant(java.time.ZoneOffset.UTC))

  // murmur3 bucket of a long under the spec's hash — recomputed here
  // from the published algorithm's PINNED vectors module (the hash
  // itself is conformance-tested in IcebergTransformUnitSpec)
  private def bucketOf(k: Long, n: Int): Int = {
    val b = new Array[Byte](8)
    (0 until 8).foreach(i => b(i) = ((k >>> (8 * i)) & 0xff).toByte)
    val c1 = 0xcc9e2d51; val c2 = 0x1b873593
    var h = 0
    var i = 0
    while (i < 8) {
      var kk = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
        ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
      kk *= c1; kk = Integer.rotateLeft(kk, 15); kk *= c2
      h ^= kk; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
      i += 4
    }
    h ^= 8
    h ^= (h >>> 16); h *= 0x85ebca6b
    h ^= (h >>> 13); h *= 0xc2b2ae35
    h ^= (h >>> 16)
    (h & Integer.MAX_VALUE) % n
  }

  test("bucket[8](k) + day(ts) + truncate[2](s) partition fields " +
      "prune at the manifest level; ranges over the bucket never " +
      "prune; values unchanged") {
    import org.apache.spark.sql.types._
    val dir = tmp("ice_transforms")
    new java.io.File(dir, "metadata").mkdirs()
    val fileSchema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("s", StringType, nullable = false),
      StructField("ts", TimestampType, nullable = false)))
    def writeData(sub: String,
        rows: Seq[org.apache.spark.sql.Row]): java.io.File = {
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), fileSchema)
        .write.parquet(s"$dir/data/$sub")
      new java.io.File(s"$dir/data/$sub").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
    }
    // k2 must land in a DIFFERENT bucket than 34 for the equality
    // assertion to show pruning
    val k1 = 34L
    val k2 = (35L to 99L).find(bucketOf(_, 8) != bucketOf(k1, 8)).get
    val f1 = writeData("g1", Seq(org.apache.spark.sql.Row(
      k1, "aardvark", utcTs("2024-01-01T10:00:00"))))
    val f2 = writeData("g2", Seq(org.apache.spark.sql.Row(
      k2, "bbx", utcTs("2024-01-05T10:00:00"))))
    val day1 = java.time.LocalDate.of(2024, 1, 1).toEpochDay.toInt
    val day2 = java.time.LocalDate.of(2024, 1, 5).toEpochDay.toInt
    val entrySchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int","field-id":0},
        |{"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
        |{"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
        |{"name":"content","type":"int","field-id":134},
        |{"name":"file_path","type":"string","field-id":100},
        |{"name":"file_format","type":"string","field-id":101},
        |{"name":"partition","field-id":102,"type":{"type":"record","name":"r102","fields":[
        |{"name":"k_bucket","type":"int","field-id":1000},
        |{"name":"ts_day","type":"int","field-id":1001},
        |{"name":"s_trunc","type":"string","field-id":1002}]}},
        |{"name":"record_count","type":"long","field-id":103},
        |{"name":"file_size_in_bytes","type":"long","field-id":104}
        |]}}]}""".stripMargin)
    def writeManifest(name: String, path: String, kb: Int,
        day: Int, st: String): Unit = {
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](entrySchema))
      w.create(entrySchema, new java.io.FileOutputStream(
        new java.io.File(dir, s"metadata/$name")))
      val dfSchema = entrySchema.getField("data_file").schema()
      val part = new GenericData.Record(
        dfSchema.getField("partition").schema())
      part.put("k_bucket", kb)
      part.put("ts_day", day)
      part.put("s_trunc", st)
      val df = new GenericData.Record(dfSchema)
      df.put("content", 0)
      df.put("file_path", s"file:$path")
      df.put("file_format", "PARQUET")
      df.put("partition", part)
      df.put("record_count", 1L)
      df.put("file_size_in_bytes", 1L)
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1)
      e.put("sequence_number", null)
      e.put("data_file", df)
      w.append(e)
      w.close()
    }
    writeManifest("m-g1.avro", f1.getAbsolutePath,
      bucketOf(k1, 8), day1, "aa")
    writeManifest("m-g2.avro", f2.getAbsolutePath,
      bucketOf(k2, 8), day2, "bb")
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
    Seq("m-g1.avro", "m-g2.avro").foreach { n =>
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
         |{"id":2,"name":"s","required":false,"type":"string"},
         |{"id":3,"name":"ts","required":false,"type":"timestamptz"}]}],
         |"default-spec-id":0,"partition-specs":[{"spec-id":0,
         |"fields":[
         |{"name":"k_bucket","transform":"bucket[8]","source-id":1,"field-id":1000},
         |{"name":"ts_day","transform":"day","source-id":3,"field-id":1001},
         |{"name":"s_trunc","transform":"truncate[2]","source-id":2,"field-id":1002}]}],
         |"current-snapshot-id":0,"snapshots":[{"snapshot-id":0,
         |"sequence-number":1,
         |"manifest-list":"$dir/metadata/snap-0.avro"}]}"""
        .stripMargin.replace("\n", ""))

    def read(where: Option[String]) =
      IcebergInterop.readIceberg(spark, dir, None, where)
    // unpruned: both rows, both files
    val all = read(None)
    assert(all.select("k").collect().map(_.getLong(0)).toSet ==
      Set(k1, k2))
    assert(scanned(all).size == 2)
    // BUCKET equality prunes to the matching bucket's file
    val eq = read(Some(s"k = $k1"))
    assert(eq.select("k").collect().map(_.getLong(0)).toSet == Set(k1))
    val sEq = scanned(eq)
    assert(sEq.size == 1 && sEq.forall(_.contains("/g1/")),
      s"bucket equality did not prune: $sEq")
    // a RANGE over the bucketed column keeps every file (hashing
    // destroys order) — and still row-filters correctly
    val rng = read(Some("k > 0"))
    assert(rng.select("k").collect().map(_.getLong(0)).toSet ==
      Set(k1, k2))
    assert(scanned(rng).size == 2)
    // DAY range prunes on the temporal ordinal
    val early = read(Some("ts < TIMESTAMP '2024-01-02 00:00:00'"))
    assert(early.select("k").collect().map(_.getLong(0)).toSet ==
      Set(k1))
    assert(scanned(early).forall(_.contains("/g1/")),
      s"day-transform range did not prune: ${scanned(early)}")
    val late = read(Some("ts >= TIMESTAMP '2024-01-05 00:00:00'"))
    assert(late.select("k").collect().map(_.getLong(0)).toSet ==
      Set(k2))
    assert(scanned(late).forall(_.contains("/g2/")))
    // boundary day: a predicate INSIDE g2's day keeps g2 (monotonic
    // transforms collapse strictness, never over-prune)
    val mid = read(Some("ts > TIMESTAMP '2024-01-05 23:00:00'"))
    assert(mid.collect().isEmpty)
    assert(scanned(mid).forall(_.contains("/g2/")))
    // TRUNCATE equality and range
    val sEq2 = read(Some("s = 'aax'")) // truncates to 'aa'
    assert(sEq2.collect().isEmpty)
    assert(scanned(sEq2).forall(_.contains("/g1/")),
      s"truncate equality did not prune: ${scanned(sEq2)}")
    val sLt = read(Some("s < 'ab'"))
    assert(sLt.select("s").collect().map(_.getString(0)).toSet ==
      Set("aardvark"))
    assert(scanned(sLt).forall(_.contains("/g1/")))
    // combined conjuncts intersect their prunings
    val combo = read(Some(
      s"k = $k1 AND ts < TIMESTAMP '2024-01-02 00:00:00'"))
    assert(combo.select("k").collect().map(_.getLong(0)).toSet ==
      Set(k1))
    assert(scanned(combo).size == 1)
    // IN lists prune as disjunctions of equalities over the bucket
    val inOne = read(Some(s"k IN ($k1)"))
    assert(inOne.select("k").collect().map(_.getLong(0)).toSet ==
      Set(k1))
    // single-member IN folds to equality at parse time either way;
    // the two-member list must keep BOTH buckets' files
    val inBoth = read(Some(s"k IN ($k1, $k2)"))
    assert(inBoth.select("k").collect().map(_.getLong(0)).toSet ==
      Set(k1, k2))
    assert(scanned(inBoth).size == 2)
    // a same-bucket-as-k1 absent member keeps only g1 and row-filters
    val absent = (100L to 200L)
      .find(v => bucketOf(v, 8) == bucketOf(k1, 8)).get
    val inMiss = read(Some(s"k IN ($absent)"))
    assert(inMiss.collect().isEmpty)
    assert(scanned(inMiss).forall(_.contains("/g1/")),
      s"bucket IN kept a non-matching bucket: ${scanned(inMiss)}")
    // and the SQL surface gets the same pruning through the
    // enclosing-WHERE pushdown
    val viaSql = spark.sql(
      s"SELECT k FROM iceberg_scan('$dir') WHERE k = $k1")
    assert(viaSql.collect().map(_.getLong(0)).toSet == Set(k1))
    assert(scanned(viaSql).size == 1,
      s"SQL bucket pruning failed: ${scanned(viaSql)}")
    val viaSqlIn = spark.sql(
      s"SELECT k FROM iceberg_scan('$dir') WHERE k IN ($k1, $absent)")
    assert(viaSqlIn.collect().map(_.getLong(0)).toSet == Set(k1))
    assert(scanned(viaSqlIn).forall(_.contains("/g1/")),
      s"SQL IN pruning failed: ${scanned(viaSqlIn)}")
  }
}
