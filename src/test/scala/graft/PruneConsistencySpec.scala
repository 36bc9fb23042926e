package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.DeltaInterop

/** Seeded randomized consistency for METADATA-LEVEL FILE PRUNING: for
  * random multi-file Delta tables (random values incl. negative,
  * boundary, supplementary-plane strings; stats on some files,
  * missing on others; nulls) and random predicates (ranges,
  * equalities, IN lists, IS [NOT] NULL, conjunctions), the pruned
  * read `readDelta(where = p)` must return EXACTLY the rows of the
  * unpruned read filtered by `p` — the conservative-superset contract
  * machine-checked across the whole shape space, not just the
  * hand-picked fixtures. Fixed seed: failures reproduce.
  */
class PruneConsistencySpec extends AnyFunSuite with SparkTestBase {

  private def tmp(p: String): String = java.nio.file.Files
    .createTempDirectory(p).toFile.getAbsolutePath

  test("randomized (seeded) predicates over randomized stats-bearing " +
      "logs: pruned results equal filter-after-read, every round") {
    val spark2 = spark
    import spark2.implicits._
    import java.nio.file.{Files, Paths}
    val rnd = new scala.util.Random(20260815L)
    // bounds must be collected in UTF-8 byte order (what real writers
    // do and what the pruner compares under) — Scala's default String
    // min/max is UTF-16 order, which DISAGREES for the emoji pool and
    // would write fixture bounds no conformant writer produces
    def u8cmp(a: String, b: String): Int = {
      val (xa, xb) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
      val n = math.min(xa.length, xb.length)
      var i = 0
      while (i < n) {
        val d = (xa(i) & 0xff) - (xb(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      xa.length - xb.length
    }
    implicit val utf8Order: Ordering[String] =
      (a: String, b: String) => u8cmp(a, b)
    val stringPool = Seq("", "a", "apple", "pear", "zebra", "ab",
      "aa", "😀", "😀x", "￿", "z😀", "ASCII only", "m")
    (0 until 6).foreach { round =>
      val delta = tmp(s"prune_rand_$round")
      val nFiles = 2 + rnd.nextInt(4)
      val schema = Seq((1L, "a")).toDF("id", "s").schema.json
        .replace("\\", "\\\\").replace("\"", "\\\"")
      val allRows = scala.collection.mutable.ArrayBuffer[
        (java.lang.Long, String)]()
      val adds = (0 until nFiles).map { i =>
        val nRows = 1 + rnd.nextInt(5)
        val rows: Seq[(java.lang.Long, String)] = (0 until nRows).map {
          _ =>
            val id: java.lang.Long =
              if (rnd.nextInt(10) == 0) null
              else Long.box(rnd.nextInt(200).toLong - 50L)
            (id, stringPool(rnd.nextInt(stringPool.size)))
        }
        allRows ++= rows
        rows.toDF("id", "s").coalesce(1)
          .write.parquet(s"$delta/f$i")
        val part = new java.io.File(s"$delta/f$i").listFiles()
          .map(_.getName).find(_.endsWith(".parquet")).get
        // half the files carry stats (min/max/nullCount over both
        // columns where sensible), half carry none
        val stats =
          if (rnd.nextBoolean()) {
            val ids = rows.flatMap(r => Option(r._1).map(_.longValue()))
            val ss = rows.map(_._2)
            val nullIds = rows.count(_._1 == null)
            def esc(x: String) = x.replace("\\", "\\\\")
              .replace("\"", "\\\"")
            val minS = esc(ss.min(utf8Order))
            val maxS = esc(ss.max(utf8Order))
            val idMin = if (ids.isEmpty) "" else
              s"""\\"id\\":${ids.min},"""
            val idMax = if (ids.isEmpty) "" else
              s"""\\"id\\":${ids.max},"""
            s""","stats":"{\\"numRecords\\":${rows.size},\\"minValues\\":{$idMin\\"s\\":\\"$minS\\"},\\"maxValues\\":{$idMax\\"s\\":\\"$maxS\\"},\\"nullCount\\":{\\"id\\":$nullIds,\\"s\\":0}}""""
          } else ""
        s"""{"add":{"path":"f$i/$part","size":1,"partitionValues":{},"modificationTime":0,"dataChange":true$stats}}"""
      }
      Files.createDirectories(Paths.get(s"$delta/_delta_log"))
      Files.writeString(Paths.get(
        s"$delta/_delta_log/00000000000000000000.json"),
        s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
{"metaData":{"id":"x","schemaString":"$schema","format":{"provider":"parquet","options":{}},"partitionColumns":[],"configuration":{}}}
""" + adds.mkString("\n") + "\n")
      def slit(): String =
        "'" + stringPool(rnd.nextInt(stringPool.size))
          .replace("'", "''") + "'"
      def conjunct(): String = rnd.nextInt(7) match {
        case 0 => s"id ${Seq("<", "<=", ">", ">=", "=")(
          rnd.nextInt(5))} ${rnd.nextInt(220) - 60}"
        case 1 => s"s ${Seq("<", "<=", ">", ">=", "=")(
          rnd.nextInt(5))} ${slit()}"
        case 2 => s"id IN (${Seq.fill(1 + rnd.nextInt(4))(
          rnd.nextInt(220) - 60).mkString(", ")})"
        case 3 => s"s IN (${Seq.fill(1 + rnd.nextInt(3))(slit())
          .mkString(", ")})"
        case 4 => s"id IS ${if (rnd.nextBoolean()) "" else "NOT "}NULL"
        case 5 => s"s LIKE 'a%'" // unprunable shape rides along
        case _ => s"id % 3 = ${rnd.nextInt(3)}" // unprunable
      }
      (0 until 8).foreach { _ =>
        val pred = Seq.fill(1 + rnd.nextInt(3))(conjunct())
          .mkString(" AND ")
        val pruned = DeltaInterop
          .readDelta(spark, delta, where = Some(pred))
          .collect().map(r => (r.get(0), r.get(1))).toSeq
          .sortBy(_.toString)
        val full = DeltaInterop.readDelta(spark, delta)
          .filter(pred)
          .collect().map(r => (r.get(0), r.get(1))).toSeq
          .sortBy(_.toString)
        assert(pruned == full,
          s"round $round predicate [$pred]: pruned=$pruned full=$full")
      }
    }
  }
}
