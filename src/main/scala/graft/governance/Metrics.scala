package graft.governance

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.{FileSourceScanExec, QueryExecution,
  SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
  QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Per-query ENGINE metrics — the Spark analog of the reference's
  * per-workgroup CloudWatch query metrics
  * (`publish_cloudwatch_metrics_enabled`, reference `main.tf:502`):
  * bytes/files scanned, partition-pruning effectiveness, shuffle
  * volume — the ops signal a lake admin dashboards, one record per
  * executed query beside the audit trail's who/what record.
  *
  * Sourced from the EXECUTED plan's SQLMetrics (accumulator values at
  * listener time, the same numbers the Spark UI shows), so
  * `files_read < files_total` is a measured pruning witness, not a
  * plan-shape claim. `files_total`/`bytes_read` come from the scan's
  * file index / "filesSize" metric; `shuffle_bytes` sums the
  * exchanges' dataSize. Values are machine/run-dependent by nature —
  * the deterministic fields (file counts, row counts) are spec-pinned
  * (MetricsSpec), the rest are observability.
  */
final case class QueryMetricsEvent(
    funcName: String,
    principal: String,
    tables: Seq[String],
    rowsOut: Option[Long],
    filesRead: Long,
    filesTotal: Long,
    bytesRead: Long,
    partitionsRead: Option[Long],
    shuffles: Int,
    shuffleBytes: Long,
    durationNs: Long)

/** Process-wide metrics sink — the [[AuditLog]] ring pattern; a
  * durable deployment ships these to its metrics store (the reference
  * publishes to CloudWatch).
  */
object MetricsLog {
  private val ring = new java.util.ArrayDeque[QueryMetricsEvent]()
  private val Cap = 10000

  def record(e: QueryMetricsEvent): Unit = synchronized {
    ring.addLast(e)
    if (ring.size > Cap) ring.pollFirst()
  }

  def events: Seq[QueryMetricsEvent] = synchronized { ring.asScala.toSeq }
  def clear(): Unit = synchronized { ring.clear() }

  def toDF(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    val s = spark
    import s.implicits._
    events.toDF()
  }
}

private[governance] object QueryMetricsCollector {

  /** Every node of the FINAL physical plan — through the adaptive
    * wrapper and materialized query stages. ReusedExchangeExec is a
    * leaf whose metrics belong to the original exchange (walked where
    * it lives), so reuse never double-counts.
    */
  private def walk(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: walk(a.executedPlan)
    case q: QueryStageExec => q +: walk(q.plan)
    case other => other +: other.children.flatMap(walk)
  }

  private def m(p: SparkPlan, name: String): Option[Long] =
    p.metrics.get(name).map(_.value)

  /** Metrics for one finished query; None when the executed plan is
    * unavailable (planning-time failure) — the audit record still
    * lands, metrics just have nothing to measure.
    */
  def collect(funcName: String, principal: String, tables: Seq[String],
      qe: QueryExecution, durationNs: Long): Option[QueryMetricsEvent] =
    scala.util.Try {
      val seen = java.util.Collections.newSetFromMap(
        new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
      val nodes = walk(qe.executedPlan).filter(seen.add)
      val scans = nodes.collect { case f: FileSourceScanExec => f }
      val filesRead = scans.flatMap(m(_, "numFiles")).sum
      // the file index lists the WHOLE table; numFiles is post-pruning
      val filesTotal = scans
        .map(_.relation.location.inputFiles.length.toLong).sum
      val bytesRead = scans.flatMap(m(_, "filesSize")).sum
      val parts = scans.flatMap(m(_, "numPartitions"))
      val shuffles = nodes.collect { case s: ShuffleExchangeExec => s }
      val shuffleBytes = shuffles.flatMap(m(_, "dataSize")).sum
      // rows out = the metric nearest the root (codegen/adaptive
      // wrappers carry no numOutputRows of their own)
      val rowsOut = nodes.view.flatMap(m(_, "numOutputRows")).headOption
      QueryMetricsEvent(funcName, principal, tables,
        rowsOut, filesRead, filesTotal,
        bytesRead, if (parts.isEmpty) None else Some(parts.sum),
        shuffles.size, shuffleBytes, durationNs)
    }.toOption
}
