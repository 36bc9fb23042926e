package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{CdcApply, Quality}
import graft.streaming.Quality.Expectation

case class QRow(id: Long, version: Long, deleted: Boolean,
    score: java.lang.Double, name: String)

/** Write-time quality gate: expectations split each batch into the
  * main CDC table and a quarantine CDC table under the SAME batch id.
  * Pins the semantics the scaladoc promises: NULL predicates fail
  * closed, deletes bypass the gate, the snapshot serves the latest
  * ADMITTED version, quarantine is a real CDC table (feed included),
  * replay is exactly-once on both sides, and failOnViolation writes
  * nothing.
  */
class QualitySpec extends AnyFunSuite with SparkTestBase {

  private def tmp(prefix: String): String = java.nio.file.Files
    .createTempDirectory(prefix).toFile.getAbsolutePath

  private val exps = Seq(
    Expectation("score_nonneg", col("score") >= 0),
    Expectation("name_present", length(col("name")) > 0))

  private def df(rows: QRow*) = {
    import spark.implicits._
    rows.toDF()
  }

  test("gate splits a batch: clean rows merge, violators quarantine " +
      "with sorted reasons, NULL fails closed") {
    val root = tmp("qg_root"); val q = tmp("qg_quar")
    val report = Quality.applyChecked(
      df(
        QRow(1L, 1L, deleted = false, 5.0, "ok"),
        QRow(2L, 1L, deleted = false, -1.0, "neg"),
        QRow(3L, 1L, deleted = false, null, ""), // NULL score + empty name
        QRow(4L, 1L, deleted = false, 2.0, "fine")),
      0L, root, q, Seq("id"), "version", Some("deleted"), exps,
      commitTs = Some(1000L))
    assert(report.admitted == 2 && report.quarantined == 2 &&
      report.deletes == 0)
    assert(report.byExpectation ==
      Map("score_nonneg" -> 2L, "name_present" -> 1L))
    assert(report.appliedMain && report.appliedQuarantine)

    val main = CdcApply.readSnapshot(spark, root).get
      .select("id").collect().map(_.getLong(0)).sorted
    assert(main.toSeq == Seq(1L, 4L))
    val quar = CdcApply.readSnapshot(spark, q).get
      .select("id", Quality.ViolatedCol).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    // reasons are name-sorted and comma-joined
    assert(quar.toSeq == Seq(
      (2L, "score_nonneg"), (3L, "name_present,score_nonneg")))
  }

  test("snapshot serves the latest ADMITTED version; deletes bypass " +
      "the gate even with NULL payload") {
    val root = tmp("qg2_root"); val q = tmp("qg2_quar")
    def apply(b: Long, rows: QRow*) = Quality.applyChecked(df(rows: _*),
      b, root, q, Seq("id"), "version", Some("deleted"), exps,
      commitTs = Some(1000L + b))
    apply(0L,
      QRow(1L, 1L, deleted = false, 1.0, "a"),
      QRow(2L, 1L, deleted = false, 1.0, "b"))
    // v2 of key 1 violates -> quarantined; main keeps serving v1
    apply(1L, QRow(1L, 2L, deleted = false, -9.0, "a"))
    // delete of key 2 with NULL payload: bypasses the gate, key dies
    apply(2L, QRow(2L, 3L, deleted = true, null, null))
    val main = CdcApply.readSnapshot(spark, root).get
      .select("id", "version").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(main.toSeq == Seq((1L, 1L)))
    // the quarantine's change feed is the rejection audit trail
    val feed = CdcApply.changesSince(spark, q, -1L).get
      .select("id", "version", Quality.ViolatedCol).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(feed.toSeq == Seq((1L, 2L, "score_nonneg")))
  }

  test("replay of a gated batch is exactly-once on BOTH tables") {
    val root = tmp("qg3_root"); val q = tmp("qg3_quar")
    val batch = df(
      QRow(1L, 1L, deleted = false, 1.0, "a"),
      QRow(2L, 1L, deleted = false, -1.0, "b"))
    val r1 = Quality.applyChecked(batch, 0L, root, q, Seq("id"),
      "version", Some("deleted"), exps, commitTs = Some(1000L))
    assert(r1.appliedMain && r1.appliedQuarantine)
    val r2 = Quality.applyChecked(batch, 0L, root, q, Seq("id"),
      "version", Some("deleted"), exps, commitTs = Some(2000L))
    // counts still reported; the replay guards dropped both writes
    assert(!r2.appliedMain && !r2.appliedQuarantine &&
      r2.quarantined == 1)
    assert(CdcApply.readSnapshot(spark, root).get.count() == 1)
    assert(CdcApply.readSnapshot(spark, q).get.count() == 1)
  }

  test("failOnViolation aborts loudly with per-expectation counts " +
      "and writes NOTHING") {
    val root = tmp("qg4_root"); val q = tmp("qg4_quar")
    val e = intercept[IllegalStateException] {
      Quality.applyChecked(
        df(QRow(1L, 1L, deleted = false, -1.0, "a"),
          QRow(2L, 1L, deleted = false, 1.0, "b")),
        0L, root, q, Seq("id"), "version", Some("deleted"), exps,
        failOnViolation = true)
    }
    assert(e.getMessage.contains("score_nonneg=1"))
    assert(CdcApply.readSnapshot(spark, root).isEmpty)
    assert(CdcApply.readSnapshot(spark, q).isEmpty)
  }

  test("reserved marker column and malformed expectation names are " +
      "refused") {
    val bad = df(QRow(1L, 1L, deleted = false, 1.0, "a"))
      .withColumn(Quality.ViolatedCol, lit("x"))
    intercept[IllegalArgumentException] {
      Quality.mark(bad, exps)
    }
    intercept[IllegalArgumentException] {
      Quality.mark(df(QRow(1L, 1L, deleted = false, 1.0, "a")),
        Seq(Expectation("has,comma", lit(true))))
    }
    intercept[IllegalArgumentException] {
      Quality.mark(df(QRow(1L, 1L, deleted = false, 1.0, "a")),
        Seq(Expectation("dup", lit(true)), Expectation("dup", lit(false))))
    }
  }

  test("streaming gate: startChecked routes micro-batches through the " +
      "gate under the stream's batch ids") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val root = tmp("qg5_root"); val q = tmp("qg5_quar")
    val stream = MemoryStream[QRow]
    val query = Quality.startChecked(stream.toDF(), root, q, Seq("id"),
      "version", Some("deleted"), exps,
      queryName = "qg5", clock = Some(() => 1000L))
    try {
      stream.addData(
        QRow(1L, 1L, deleted = false, 1.0, "a"),
        QRow(2L, 1L, deleted = false, -2.0, "b"))
      query.processAllAvailable()
      stream.addData(QRow(2L, 2L, deleted = false, 2.0, "b"))
      query.processAllAvailable()
    } finally query.stop()
    val main = CdcApply.readSnapshot(spark, root).get
      .select("id", "version").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(main.toSeq == Seq((1L, 1L), (2L, 2L)))
    val quar = CdcApply.readSnapshot(spark, q).get
      .select("id", "version").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(quar.toSeq == Seq((2L, 1L)))
  }
}
