package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.{DeletionVectors => DV, DeltaInterop}

/** Delta deletion vectors ([[graft.sources.DeletionVectors]]): the
  * decoder is pinned against HAND-AUTHORED byte-level conformance
  * vectors built from the PUBLISHED serialization specs (delta.io
  * PROTOCOL.md file layout + the RoaringFormatSpec container
  * formats + the ZeroMQ Z85 test vector) — no Delta writer ships in
  * this environment, so the bytes here ARE the spec, written out
  * field by field, never produced by the encoder under test. The
  * end-to-end tests then read hand-built DV-bearing logs through
  * [[DeltaInterop.readDelta]].
  */
class DeletionVectorSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(p: String): String = java.nio.file.Files
    .createTempDirectory(p).toFile.getAbsolutePath

  // little-endian byte builders — the conformance vectors are authored
  // with these, field by field per the published layouts
  private def le16(v: Int): Seq[Byte] =
    Seq((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte)
  private def le32(v: Long): Seq[Byte] =
    (0 until 4).map(i => ((v >>> (8 * i)) & 0xff).toByte)
  private def le64(v: Long): Seq[Byte] =
    (0 until 8).map(i => ((v >>> (8 * i)) & 0xff).toByte)
  private def be32(v: Long): Seq[Byte] =
    (3 to 0 by -1).map(i => ((v >>> (8 * i)) & 0xff).toByte)

  private val Magic = 1681511377L

  test("Z85: the ZeroMQ spec test vector decodes and round-trips") {
    val bytes = Array(0x86, 0x4f, 0xd2, 0x6f, 0xb5, 0x59, 0xf7, 0x5b)
      .map(_.toByte)
    assert(DV.z85Decode("HelloWorld").toSeq == bytes.toSeq)
    assert(DV.z85Encode(bytes) == "HelloWorld")
    intercept[IllegalArgumentException] { DV.z85Decode("abc") }
  }

  test("roaring conformance: ARRAY containers across two 16-bit keys " +
      "(no-run cookie 12346, descriptive + offset headers)") {
    // one bucket (high key 0), one 32-bit bitmap holding {1, 2, 65636}
    // = container key 0 -> [1, 2], container key 1 -> [100]
    val bitmap =
      le32(12346L) ++ le32(2L) ++          // cookie, container count
        le16(0) ++ le16(1) ++              // key 0, cardinality-1 = 1
        le16(1) ++ le16(0) ++              // key 1, cardinality-1 = 0
        le32(24L) ++ le32(28L) ++          // offsets from bitmap start
        le16(1) ++ le16(2) ++              // container 0 values
        le16(100)                          // container 1 values
    val payload =
      (le32(Magic) ++ le64(1L) ++ le32(0L) ++ bitmap).toArray
    assert(DV.decodePayload(payload).toSeq == Seq(1L, 2L, 65636L))
  }

  test("roaring conformance: RUN container (cookie 12347, run flag " +
      "bitset, no offset header under 4 containers)") {
    // values 10..20 = one run (start 10, length-1 = 10)
    val bitmap =
      le32(12347L | (0L << 16)) ++  // cookie | (nContainers-1) << 16
        Seq(1.toByte) ++            // run-flag bitset: container 0 runs
        le16(0) ++ le16(10) ++      // key 0, cardinality-1 = 10
        le16(1) ++                  // 1 run
        le16(10) ++ le16(10)        // start 10, length-1 = 10
    val payload =
      (le32(Magic) ++ le64(1L) ++ le32(0L) ++ bitmap).toArray
    assert(DV.decodePayload(payload).toSeq == (10L to 20L))
  }

  test("roaring conformance: BITSET container (cardinality > 4096, " +
      "8 KiB little-endian bitset) and MULTI-BUCKET 64-bit indexes") {
    // bucket 0: values 0..4999 as a bitset container
    val bits = new Array[Byte](8192)
    (0 until 5000).foreach(v => bits(v / 8) =
      (bits(v / 8) | (1 << (v % 8))).toByte)
    val bm0 =
      le32(12346L) ++ le32(1L) ++
        le16(0) ++ le16(4999) ++   // cardinality-1
        le32(16L) ++               // offset
        bits.toSeq
    // bucket 1 (high key 1 => indexes + 2^32): array container {7}
    val bm1 =
      le32(12346L) ++ le32(1L) ++
        le16(0) ++ le16(0) ++
        le32(16L) ++
        le16(7)
    val payload = (le32(Magic) ++ le64(2L) ++
      le32(0L) ++ bm0 ++ le32(1L) ++ bm1).toArray
    val got = DV.decodePayload(payload)
    assert(got.length == 5001)
    assert(got.take(5000).toSeq == (0L until 5000L))
    assert(got.last == (1L << 32) + 7L)
  }

  test("DV file envelope: version byte + big-endian size + CRC-32; " +
      "corrupt checksum, wrong version, and wrong magic refuse") {
    val payload = (le32(Magic) ++ le64(1L) ++ le32(0L) ++
      le32(12346L) ++ le32(1L) ++ le16(0) ++ le16(1) ++ le32(16L) ++
      le16(3) ++ le16(9)).toArray
    val crc = new java.util.zip.CRC32()
    crc.update(payload)
    val file = (Seq(1.toByte) ++ be32(payload.length.toLong) ++
      payload.toSeq ++ be32(crc.getValue)).toArray
    assert(DV.decodeAt(file, 1L, payload.length).toSeq == Seq(3L, 9L))
    // flip one payload byte -> checksum refuses
    val bad = file.clone(); bad(7) = (bad(7) ^ 1).toByte
    val e = intercept[IllegalArgumentException] {
      DV.decodeAt(bad, 1L, payload.length) }
    assert(e.getMessage.contains("checksum"), e.getMessage)
    // version byte 2 refuses
    val v2 = file.clone(); v2(0) = 2
    assert(intercept[IllegalArgumentException] {
      DV.decodeAt(v2, 1L, payload.length)
    }.getMessage.contains("version"))
    // wrong magic refuses
    val wrongMagic = (le32(Magic + 1) ++ le64(0L)).toArray
    assert(intercept[IllegalArgumentException] {
      DV.decodePayload(wrongMagic)
    }.getMessage.contains("magic"))
  }

  // ---- end-to-end: DV-bearing hand-built logs through readDelta ------

  private def writeDataFile(dir: String, sub: String): String = {
    val spark2 = spark
    import spark2.implicits._
    // known row order: row_index i holds id = i
    Seq((0L, "r0"), (1L, "r1"), (2L, "r2"), (3L, "r3"))
      .toDF("id", "s").coalesce(1).sortWithinPartitions("id")
      .write.parquet(s"$dir/$sub")
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

  private def logLine(dir: String, v: Long, lines: String): Unit = {
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$dir/_delta_log"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(
      f"$dir/_delta_log/$v%020d.json"), lines)
  }

  private def protoAndMeta: String =
    s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"]}}
{"metaData":{"id":"x","schemaString":"$schemaJson","format":{"provider":"parquet","options":{}},"partitionColumns":[],"configuration":{}}}"""

  private def dvJson(storageType: String, pathOrInline: String,
      offset: Option[Long], size: Int, card: Long): String = {
    val off = offset.map(o => s""""offset":$o,""").getOrElse("")
    s""""deletionVector":{"storageType":"$storageType","pathOrInlineDv":"$pathOrInline",$off"sizeInBytes":$size,"cardinality":$card}"""
  }

  private def ids(dir: String): Set[Long] =
    DeltaInterop.readDelta(spark, dir).select("id").collect()
      .map(_.getLong(0)).toSet

  test("INLINE deletion vector (storageType i): z85 payload in the " +
      "add action deletes rows 0 and 2; a later DV-update re-add " +
      "replaces the vector") {
    val dir = tmp("dv_inline")
    val rel = writeDataFile(dir, "files")
    val payload = DV.encodePayload(Seq(0L, 2L))
    val padded = java.util.Arrays.copyOf(payload,
      ((payload.length + 3) / 4) * 4)
    logLine(dir, 0L, protoAndMeta + "\n" +
      s"""{"add":{"path":"$rel","size":1,"partitionValues":{},"modificationTime":0,"dataChange":true,${dvJson("i", DV.z85Encode(padded), None, payload.length, 2L)}}}
""")
    assert(ids(dir) == Set(1L, 3L))
    // DV update: version 1 re-adds the SAME file with a larger vector
    val p2 = DV.encodePayload(Seq(0L, 2L, 3L))
    val p2pad = java.util.Arrays.copyOf(p2, ((p2.length + 3) / 4) * 4)
    logLine(dir, 1L,
      s"""{"remove":{"path":"$rel","dataChange":true}}
{"add":{"path":"$rel","size":1,"partitionValues":{},"modificationTime":0,"dataChange":true,${dvJson("i", DV.z85Encode(p2pad), None, p2.length, 3L)}}}
""")
    assert(ids(dir) == Set(1L))
  }

  test("DV resolution strategy follows Σ descriptor cardinality: " +
      "small totals resolve via an EXPLICIT BROADCAST anti-join; " +
      "past the threshold the scan never joins — rows filter against " +
      "per-file bitmaps decoded on executors — and values are " +
      "identical") {
    val dir = tmp("dv_strategy")
    val rel = writeDataFile(dir, "files")
    val payload = DV.encodePayload(Seq(0L, 2L))
    val padded = java.util.Arrays.copyOf(payload,
      ((payload.length + 3) / 4) * 4)
    logLine(dir, 0L, protoAndMeta + "\n" +
      s"""{"add":{"path":"$rel","size":1,"partitionValues":{},"modificationTime":0,"dataChange":true,${dvJson("i", DV.z85Encode(padded), None, payload.length, 2L)}}}
""")
    // small path: broadcast anti-join, plan-asserted
    val small = DeltaInterop.readDelta(spark, dir)
    assert(small.select("id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L))
    val smallPlan = small.queryExecution.executedPlan.toString
    assert(smallPlan.contains("BroadcastHashJoin") &&
      smallPlan.contains("LeftAnti"),
      s"small-DV read lost its broadcast anti-join:\n$smallPlan")
    // large path (threshold forced to 0): no join at all — the rows
    // filter against the broadcastable descriptor map
    spark.conf.set("spark.graft.delta.dvBroadcastRows", "0")
    try {
      val large = DeltaInterop.readDelta(spark, dir)
      assert(large.select("id").collect().map(_.getLong(0)).toSet ==
        Set(1L, 3L))
      val largePlan = large.queryExecution.executedPlan.toString
      assert(!largePlan.contains("Join"),
        s"large-DV read still joins:\n$largePlan")
    } finally spark.conf.unset("spark.graft.delta.dvBroadcastRows")
  }

  test("intra-commit ordering: a DV-update commit that serializes the " +
      "ADD (new vector) BEFORE the REMOVE (old vector) of the same " +
      "path keeps the file live — reconciliation is per commit, not " +
      "per line") {
    val dir = tmp("dv_add_first")
    val rel = writeDataFile(dir, "files")
    val p1 = DV.encodePayload(Seq(0L))
    val p1pad = java.util.Arrays.copyOf(p1, ((p1.length + 3) / 4) * 4)
    logLine(dir, 0L, protoAndMeta + "\n" +
      s"""{"add":{"path":"$rel","size":1,"partitionValues":{},"modificationTime":0,"dataChange":true,${dvJson("i", DV.z85Encode(p1pad), None, p1.length, 1L)}}}
""")
    assert(ids(dir) == Set(1L, 2L, 3L))
    // the protocol gives NO intra-commit ordering guarantee: this
    // legal commit lists the add (new, larger vector) first and the
    // remove (old file version) second — applying line order would
    // delete the just-added file and silently drop every row
    val p2 = DV.encodePayload(Seq(0L, 2L))
    val p2pad = java.util.Arrays.copyOf(p2, ((p2.length + 3) / 4) * 4)
    logLine(dir, 1L,
      s"""{"add":{"path":"$rel","size":1,"partitionValues":{},"modificationTime":0,"dataChange":true,${dvJson("i", DV.z85Encode(p2pad), None, p2.length, 2L)}}}
{"remove":{"path":"$rel","dataChange":true}}
""")
    assert(ids(dir) == Set(1L, 3L))
    // a commit with ONLY a remove still removes
    logLine(dir, 2L, s"""{"remove":{"path":"$rel","dataChange":true}}
""")
    assert(ids(dir).isEmpty)
  }

  test("FILE-BACKED deletion vectors: storageType u (z85 uuid under " +
      "the table root) and p (absolute path); cardinality mismatch " +
      "and unknown storage types refuse") {
    val dir = tmp("dv file") // space: the canonical-uri join must hold
    val rel = writeDataFile(dir, "files")
    val payload = DV.encodePayload(Seq(1L))
    // u: uuid encodes to 20 z85 chars; file deletion_vector_<uuid>.bin
    val uuid = new java.util.UUID(0x0102030405060708L, 0x090a0b0c0d0e0f10L)
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits)
    bb.putLong(uuid.getLeastSignificantBits)
    val off = DV.writeDvFile(spark,
      new org.apache.hadoop.fs.Path(dir, s"deletion_vector_$uuid.bin"),
      payload)
    logLine(dir, 0L, protoAndMeta + "\n" +
      s"""{"add":{"path":"$rel","size":1,"partitionValues":{},"modificationTime":0,"dataChange":true,${dvJson("u", DV.z85Encode(bb.array()), Some(off), payload.length, 1L)}}}
""")
    assert(ids(dir) == Set(0L, 2L, 3L))
    // p: absolute path
    val dir2 = tmp("dv_abs")
    val rel2 = writeDataFile(dir2, "files")
    val abs = new java.io.File(dir2, "dv_abs.bin").getAbsolutePath
    val off2 = DV.writeDvFile(spark,
      new org.apache.hadoop.fs.Path(abs), DV.encodePayload(Seq(0L, 3L)))
    logLine(dir2, 0L, protoAndMeta + "\n" +
      s"""{"add":{"path":"$rel2","size":1,"partitionValues":{},"modificationTime":0,"dataChange":true,${dvJson("p", abs, Some(off2), DV.encodePayload(Seq(0L, 3L)).length, 2L)}}}
""")
    assert(ids(dir2) == Set(1L, 2L))
    // cardinality mismatch refuses (descriptor says 3, vector holds 2)
    val dir3 = tmp("dv_card")
    val rel3 = writeDataFile(dir3, "files")
    val pl3 = DV.encodePayload(Seq(0L, 1L))
    val pl3pad = java.util.Arrays.copyOf(pl3, ((pl3.length + 3) / 4) * 4)
    logLine(dir3, 0L, protoAndMeta + "\n" +
      s"""{"add":{"path":"$rel3","size":1,"partitionValues":{},"modificationTime":0,"dataChange":true,${dvJson("i", DV.z85Encode(pl3pad), None, pl3.length, 3L)}}}
""")
    val e = intercept[Exception] {
      DeltaInterop.readDelta(spark, dir3).collect() }
    assert(e.getMessage != null &&
      e.getMessage.contains("cardinality") ||
      Option(e.getCause).exists(_.getMessage.contains("cardinality")),
      s"$e")
    // unknown storage type refuses BY NAME
    val dir4 = tmp("dv_unknown")
    val rel4 = writeDataFile(dir4, "files")
    logLine(dir4, 0L, protoAndMeta + "\n" +
      s"""{"add":{"path":"$rel4","size":1,"partitionValues":{},"modificationTime":0,"dataChange":true,${dvJson("x", "zzzzz", None, 1, 1L)}}}
""")
    val e4 = intercept[Exception] {
      DeltaInterop.readDelta(spark, dir4).collect() }
    val msg4 = e4.getMessage +
      Option(e4.getCause).map(_.getMessage).getOrElse("")
    assert(msg4.contains("storageType"), s"$e4")
  }

  test("randomized (seeded) log sequences: adds, removes, DV updates, " +
      "checkpoints with JSON cleanup, and partition values — the " +
      "reader equals ground truth after every commit, with and " +
      "without a pruning predicate") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(42)
    val dir = tmp("dv_random")
    Files.createDirectories(Paths.get(s"$dir/_delta_log"))
    val schemaStr = Seq((1L, 1)).toDF("id", "p").schema.json
    val schemaEsc = schemaStr.replace("\\", "\\\\").replace("\"", "\\\"")
    // ground truth: live file -> (partition p, surviving ids in order)
    val live = scala.collection.mutable
      .LinkedHashMap[String, (Int, Seq[Long])]()
    // per-file FULL row list (row_index i -> ids(i)) for DV updates
    val fullRows = scala.collection.mutable.Map[String, Seq[Long]]()
    var nextId = 0L
    var version = 0L
    def writeFile(p: Int, n: Int): String = {
      val ids = (nextId until nextId + n).toSeq
      nextId += n
      ids.map(i => Tuple1(i)).toDF("id")
        .coalesce(1).sortWithinPartitions("id")
        .write.parquet(s"$dir/g$nextId")
      val f = new java.io.File(s"$dir/g$nextId").listFiles()
        .map(_.getName).find(_.endsWith(".parquet")).get
      val rel = s"g$nextId/$f"
      fullRows(rel) = ids
      live(rel) = (p, ids)
      rel
    }
    def dvJsonFor(rel: String, deletedIdx: Seq[Long]): String =
      if (deletedIdx.isEmpty) ""
      else {
        val payload = DV.encodePayload(deletedIdx)
        val padded = java.util.Arrays.copyOf(payload,
          ((payload.length + 3) / 4) * 4)
        "," + dvJson("i", DV.z85Encode(padded), None, payload.length,
          deletedIdx.size.toLong)
      }
    def addLine(rel: String, p: Int, deletedIdx: Seq[Long]): String =
      s"""{"add":{"path":"$rel","size":1,"partitionValues":{"p":"$p"},"modificationTime":0,"dataChange":true${dvJsonFor(rel, deletedIdx)}}}"""
    def commit(lines: Seq[String]): Unit = {
      val head =
        if (version == 0L)
          Seq(s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"]}}""",
            s"""{"metaData":{"id":"x","schemaString":"$schemaEsc","format":{"provider":"parquet","options":{}},"partitionColumns":["p"],"configuration":{}}}""")
        else Seq.empty
      Files.writeString(Paths.get(
        f"$dir/_delta_log/$version%020d.json"),
        (head ++ lines).mkString("\n") + "\n")
      version += 1
    }
    // the checkpoint writer mirrors the classic action schema with
    // partitionValues + deletionVector on add
    val cpSchema = StructType(Seq(
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
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues",
          MapType(StringType, StringType)),
        StructField("deletionVector", StructType(Seq(
          StructField("storageType", StringType),
          StructField("pathOrInlineDv", StringType),
          StructField("sizeInBytes", IntegerType),
          StructField("cardinality", LongType)))))))))
    def writeCheckpointNow(): Unit = {
      val target = new java.io.File(dir,
        f"_delta_log/${version - 1}%020d.checkpoint.parquet")
      if (target.exists) return // already checkpointed this version
      val rows = Seq(
        Row(Row(3, 7, Seq("deletionVectors")), null, null),
        Row(null, Row("x", schemaStr, Seq("p"),
          Map.empty[String, String]), null)) ++
        live.toSeq.map { case (rel, (p, kept)) =>
          val full = fullRows(rel)
          val deletedIdx = full.zipWithIndex
            .collect { case (id, i) if !kept.contains(id) => i.toLong }
          val dvRow =
            if (deletedIdx.isEmpty) null
            else {
              val payload = DV.encodePayload(deletedIdx)
              val padded = java.util.Arrays.copyOf(payload,
                ((payload.length + 3) / 4) * 4)
              Row("i", DV.z85Encode(padded), payload.length,
                deletedIdx.size.toLong)
            }
          Row(null, null, Row(rel, Map("p" -> p.toString), dvRow))
        }
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), cpSchema)
        .coalesce(1).write.parquet(s"$dir/_cp_tmp")
      val part = new java.io.File(s"$dir/_cp_tmp").listFiles()
        .map(_.getName).find(_.endsWith(".parquet")).get
      Files.copy(Paths.get(s"$dir/_cp_tmp/$part"), Paths.get(
        f"$dir/_delta_log/${version - 1}%020d.checkpoint.parquet"))
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(s"$dir/_cp_tmp"))
      // log cleanup: delete every JSON the checkpoint covers
      (0L until version).foreach { v =>
        new java.io.File(dir, f"_delta_log/$v%020d.json").delete()
        new java.io.File(dir, f"_delta_log/.$v%020d.json.crc").delete()
      }
    }
    def check(): Unit = {
      val expect = live.toSeq.flatMap { case (_, (p, kept)) =>
        kept.map(id => (id, p)) }.toSet
      val got = DeltaInterop.readDelta(spark, dir)
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(got == expect, s"full read diverged at version $version")
      // a random range predicate: pruning must not change results
      val lo = rnd.nextInt(math.max(1, nextId.toInt))
      val pv = rnd.nextInt(3)
      val w = s"id >= $lo AND p = $pv"
      val gotW = DeltaInterop.readDelta(spark, dir, where = Some(w))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      val expW = expect.filter { case (id, p) => id >= lo && p == pv }
      assert(gotW == expW, s"pruned read diverged at version $version ($w)")
    }
    // seed commit: three files across two partitions
    commit(Seq(addLine(writeFile(0, 4), 0, Nil),
      addLine(writeFile(1, 3), 1, Nil),
      addLine(writeFile(0, 2), 0, Nil)))
    check()
    (1 to 8).foreach { step =>
      rnd.nextInt(4) match {
        case 0 => // add a fresh file
          val p = rnd.nextInt(3)
          commit(Seq(addLine(writeFile(p, 1 + rnd.nextInt(4)), p, Nil)))
        case 1 if live.size > 1 => // remove a random live file
          val rel = live.keys.toSeq(rnd.nextInt(live.size))
          live.remove(rel)
          commit(Seq(
            s"""{"remove":{"path":"$rel","dataChange":true}}"""))
        case 2 if live.nonEmpty => // DV update: delete one more row
          val rel = live.keys.toSeq(rnd.nextInt(live.size))
          val (p, kept) = live(rel)
          if (kept.nonEmpty) {
            val victim = kept(rnd.nextInt(kept.size))
            val newKept = kept.filterNot(_ == victim)
            live(rel) = (p, newKept)
            val full = fullRows(rel)
            val deletedIdx = full.zipWithIndex.collect {
              case (id, i) if !newKept.contains(id) => i.toLong }
            commit(Seq(
              s"""{"remove":{"path":"$rel","dataChange":true}}""",
              addLine(rel, p, deletedIdx)))
          } else commit(Seq(addLine(writeFile(p, 2), p, Nil)))
        case _ => // checkpoint + JSON cleanup (needs >= 1 commit)
          writeCheckpointNow()
      }
      check()
    }
  }

  test("deletion vectors compose with PARTITIONED tables: the vector " +
      "applies to its file's rows only, other partitions untouched") {
    val spark2 = spark
    import spark2.implicits._
    val dir = tmp("dv_part")
    val rel1 = writeDataFile(dir, "p=1")
    val rel2 = writeDataFile(dir, "p=2")
    val schema = Seq((1L, "a", 1)).toDF("id", "s", "p").schema.json
      .replace("\\", "\\\\").replace("\"", "\\\"")
    val payload = DV.encodePayload(Seq(0L, 1L))
    val padded = java.util.Arrays.copyOf(payload,
      ((payload.length + 3) / 4) * 4)
    logLine(dir, 0L,
      s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"]}}
{"metaData":{"id":"x","schemaString":"$schema","format":{"provider":"parquet","options":{}},"partitionColumns":["p"],"configuration":{}}}
{"add":{"path":"$rel1","size":1,"partitionValues":{"p":"1"},"modificationTime":0,"dataChange":true,${dvJson("i", DV.z85Encode(padded), None, payload.length, 2L)}}}
{"add":{"path":"$rel2","size":1,"partitionValues":{"p":"2"},"modificationTime":0,"dataChange":true}}
""")
    val got = DeltaInterop.readDelta(spark, dir)
      .select("id", "p").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == Set((2L, 1), (3L, 1),
      (0L, 2), (1L, 2), (2L, 2), (3L, 2)), got.toString)
  }
}
