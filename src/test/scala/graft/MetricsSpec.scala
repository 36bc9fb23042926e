package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.governance.{AccessDeniedException, Analyst, DataAdmin,
  Governance, MetricsLog, QueryMetricsEvent}

/** Per-query engine metrics ([[graft.governance.MetricsLog]], the
  * reference's CloudWatch-per-workgroup analog `main.tf:502`):
  * partition pruning must be MEASURED (files_read < files_total on a
  * pruned scan, equality on an unpruned one), shuffle volume recorded,
  * and the `metrics_events()` SQL surface admin-gated like
  * `audit_events()`.
  */
class MetricsSpec extends AnyFunSuite with SparkTestBase {

  // generous deadline: the ExecutionListenerBus is async and the full
  // suite loads the shared listener bus heavily
  private def awaitEvent(pred: QueryMetricsEvent => Boolean)
      : QueryMetricsEvent = {
    val deadline = System.currentTimeMillis() + 30000
    var found: Option[QueryMetricsEvent] = None
    while (found.isEmpty && System.currentTimeMillis() < deadline) {
      found = MetricsLog.events.find(pred)
      if (found.isEmpty) Thread.sleep(100)
    }
    found.getOrElse(fail(
      s"no matching metrics event in ${MetricsLog.events.takeRight(5)}"))
  }

  test("a partition-pruned scan records files_read < files_total " +
      "with the measured row count; the full scan reads every file") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("metrics_part")
      .toFile.getAbsolutePath
    (0 until 40).map(i => (i.toLong, i % 4)).toDF("v", "p")
      .repartition(4, col("p"))
      .write.partitionBy("p").parquet(s"$dir/t")
    val total = new java.io.File(s"$dir/t").listFiles()
      .filter(_.getName.startsWith("p=")).flatMap(_.listFiles())
      .count(_.getName.endsWith(".parquet")).toLong
    assert(total >= 4L) // one+ file per partition
    MetricsLog.clear()
    val rows = spark.read.parquet(s"$dir/t")
      .filter(col("p") === 1).collect()
    assert(rows.length == 10)
    val pruned = awaitEvent(e => e.filesRead > 0 && e.filesTotal == total)
    assert(pruned.filesRead < pruned.filesTotal,
      s"pruning must be measured: $pruned")
    assert(pruned.rowsOut.contains(10L), pruned.toString)
    assert(pruned.bytesRead > 0L, pruned.toString)
    MetricsLog.clear()
    spark.read.parquet(s"$dir/t").collect()
    val full = awaitEvent(e => e.filesRead > 0 && e.filesTotal == total)
    assert(full.filesRead == full.filesTotal, full.toString)
    assert(full.rowsOut.contains(40L), full.toString)
  }

  test("shuffling queries record exchange count and dataSize bytes") {
    import spark.implicits._
    MetricsLog.clear()
    val n = (1 to 1000).map(i => (i % 7, i.toLong)).toDF("k", "v")
      .repartition(4) // a real exchange even at 4 input partitions
      .groupBy("k").agg(sum("v")).collect().length
    assert(n == 7)
    val e = awaitEvent(e => e.shuffles >= 1 && e.rowsOut.contains(7L))
    assert(e.shuffleBytes > 0L, e.toString)
  }

  test("metrics_events() is admin-gated SQL over the ring; analysts " +
      "are refused") {
    import spark.implicits._
    MetricsLog.clear()
    Seq((1, 2)).toDF("a", "b").collect()
    awaitEvent(_ => true)
    val n = Governance.withPrincipal(spark, DataAdmin)(
      spark.sql("SELECT filesRead, shuffleBytes FROM metrics_events()"))
      .collect().length
    assert(n >= 1)
    val e = intercept[AccessDeniedException] {
      Governance.withPrincipal(spark, Analyst)(
        spark.sql("SELECT * FROM metrics_events()")).collect()
    }
    assert(e.getMessage.contains("metrics"), e.getMessage)
  }
}
