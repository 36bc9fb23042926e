package graft.governance

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** SQL surface for the governance layer itself: `audit_events()`
  * serves the audit trail ([[AuditLog]]) as a table function — the
  * reference's "query the CloudTrail from the warehouse" story
  * (reference `README.md:12`) — and `metrics_events()` its
  * engine-metrics sibling ([[MetricsLog]]: bytes/files scanned,
  * pruning, shuffle volume — the reference's per-workgroup CloudWatch
  * metrics, `main.tf:502`) without leaving the session.
  *
  * Both are ADMIN-scoped, like CloudTrail/CloudWatch: who touched
  * which governed tables, what was denied, and what every query cost
  * are themselves sensitive metadata — so any principal but the
  * DataAdmin is refused with an audit record (the denial is, of
  * course, in the trail the admin then reads). Registered by
  * [[GraftExtensions]] beside the CDC table functions; the frame is
  * captured at analysis time, the same eager-command semantics as
  * `cdc_tables()`.
  */
object GovernanceSql {

  private[graft] val tableFunctions: Seq[(FunctionIdentifier,
      ExpressionInfo, Seq[Expression] => LogicalPlan)] = Seq(
    (FunctionIdentifier("audit_events"),
      new ExpressionInfo("graft.governance.GovernanceSql", "audit_events"),
      args => {
        if (args.nonEmpty) throw new UnsupportedOperationException(
          "audit_events() takes no arguments")
        val spark = SparkSession.getActiveSession.getOrElse(
          throw new IllegalStateException("no active SparkSession"))
        val p = Principal.fromName(spark.conf.get(
          GovernanceRule.PrincipalConf, Anonymous.name))
        if (p != DataAdmin) {
          AuditLog.record(AuditEvent("audit-read-denied", p.name,
            Seq("audit_events"), governed = true, rowsOut = None,
            durationNs = 0L, error = Some("audit_events denied")))
          throw new AccessDeniedException(
            s"principal ${p.name} may not read the audit trail " +
              "(admin-scoped, like CloudTrail); only DataAdmin holds " +
              "audit access")
        }
        AuditLog.toDF(spark).queryExecution.analyzed
      }),
    (FunctionIdentifier("metrics_events"),
      new ExpressionInfo("graft.governance.GovernanceSql",
        "metrics_events"),
      args => {
        if (args.nonEmpty) throw new UnsupportedOperationException(
          "metrics_events() takes no arguments")
        val spark = SparkSession.getActiveSession.getOrElse(
          throw new IllegalStateException("no active SparkSession"))
        val p = Principal.fromName(spark.conf.get(
          GovernanceRule.PrincipalConf, Anonymous.name))
        if (p != DataAdmin) {
          AuditLog.record(AuditEvent("metrics-read-denied", p.name,
            Seq("metrics_events"), governed = true, rowsOut = None,
            durationNs = 0L, error = Some("metrics_events denied")))
          throw new AccessDeniedException(
            s"principal ${p.name} may not read the engine metrics " +
              "(admin-scoped, like the reference's CloudWatch " +
              "workgroup metrics); only DataAdmin holds metrics access")
        }
        MetricsLog.toDF(spark).queryExecution.analyzed
      }))
}
