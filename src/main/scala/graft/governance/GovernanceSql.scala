package graft.governance

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** SQL surface for the governance layer itself: `audit_events()` serves
  * the audit trail ([[AuditLog]]) as a table function — the reference's
  * "query the CloudTrail from the warehouse" story (reference
  * `README.md:12`) without leaving the session.
  *
  * The trail is ADMIN-scoped, like CloudTrail: it records which
  * principals touched which governed tables and what was denied —
  * itself sensitive metadata — so any principal but the DataAdmin is
  * refused with an audit record (the denial is, of course, in the
  * trail the admin then reads). Registered by
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
      }))
}
