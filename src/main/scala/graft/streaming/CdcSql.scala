package graft.streaming

import java.util.Locale

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, InsertIntoStatement, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, TimestampType}

/** SQL-name surface for CDC tables — the reference's entire query surface
  * is SQL strings handed to an engine (`validate.sh:74-80`
  * `start-query-execution`; `outputs.tf:41-97`), so the flagship CDC
  * layer must be reachable by NAME from `spark.sql`, not only through
  * the Scala API.
  *
  * [[registerTable]] maps a SQL identifier to a CDC table root; the
  * [[CdcTableResolution]] rule (installed by
  * `graft.governance.GraftExtensions`) expands any reference to that
  * name into the table's CURRENT snapshot plan at ANALYSIS time — every
  * query re-reads the manifest pointer, so `SELECT * FROM orders_cdc`
  * is always the live snapshot, never a stale view captured at
  * registration. SQL time travel rides the standard syntax:
  * `VERSION AS OF <batch>` resolves through
  * [[CdcApply.readSnapshotAt]], `TIMESTAMP AS OF <ts>` through
  * [[CdcApply.readSnapshotAsOf]]. Metadata rides the table-format
  * suffix convention: `` `t$history` `` / `` `t$buckets` `` /
  * `` `t$describe` `` name the operator metadata frames.
  *
  * Governance composes with zero CDC-specific wiring: the expansion
  * produces ordinary parquet relations under the table root, so when the
  * root is also registered via `GovernanceCatalog.registerLocation`, the
  * plan-time governance rule injects the principal's row filter and
  * column allowlist into the expanded plan exactly as it does for any
  * parquet read of that location (CdcGovernanceSpec proves the SQL
  * path). Writes stay engine-managed: INSERT/UPDATE/DELETE/MERGE against
  * a registered name are refused loudly — change batches enter through
  * [[CdcApply.applyBatch]], whose merge/replay semantics SQL DML cannot
  * express.
  */
object CdcSql {

  /** Registered names: lowercased identifier (1-part `t` or 2-part
    * `db.t`, as registered) → CDC table root. Global like
    * `GovernanceCatalog`'s registries — registration is session-setup
    * metadata, not per-query state.
    */
  @volatile private var tables: Map[String, String] = Map.empty

  private def keyOf(parts: Seq[String]): String =
    parts.map(_.toLowerCase(Locale.ROOT)).mkString(".")

  private def split(name: String): Seq[String] = {
    val parts = name.split('.').toSeq
    require(parts.nonEmpty && parts.forall(_.nonEmpty),
      s"invalid CDC table name '$name' — use 't' or 'db.t'")
    parts
  }

  /** Register `name` (`t` or `db.t`) as the SQL identifier of the CDC
    * table at `root`. Idempotent; re-registering moves the name. The
    * session is taken for signature symmetry with the read API — the
    * mapping itself is engine-global, and any session carrying
    * `GraftExtensions` resolves the name.
    */
  def registerTable(spark: SparkSession, root: String,
      name: String): Unit = {
    val parts = split(name)
    synchronized { tables = tables + (keyOf(parts) -> root) }
  }

  /** Remove a registered name (test isolation, table retirement). */
  def unregisterTable(name: String): Unit =
    synchronized { tables = tables - keyOf(split(name)) }

  private[streaming] def rootFor(parts: Seq[String]): Option[String] =
    tables.get(keyOf(parts))

  /** Constant-folded argument helpers for the table functions. */
  private def constArg(e: org.apache.spark.sql.catalyst.expressions
      .Expression, what: String): Any =
    if (e.foldable) e.eval()
    else throw new UnsupportedOperationException(
      s"$what must be a constant, got $e")

  private def argString(e: org.apache.spark.sql.catalyst.expressions
      .Expression, what: String): String =
    constArg(e, what) match {
      case null => throw new UnsupportedOperationException(
        s"$what must not be NULL")
      case v => v.toString
    }

  private def argLong(e: org.apache.spark.sql.catalyst.expressions
      .Expression, what: String): Long =
    constArg(e, what) match {
      case n: java.lang.Number => n.longValue()
      case v => throw new UnsupportedOperationException(
        s"$what must be an integer, got '$v'")
    }

  private def activeSession: SparkSession =
    SparkSession.getActiveSession.getOrElse(
      throw new IllegalStateException("no active SparkSession"))

  private def feedPlan(name: String,
      feed: (SparkSession, String) => Option[org.apache.spark.sql
        .DataFrame]): org.apache.spark.sql.catalyst.plans.logical
      .LogicalPlan = {
    val spark = activeSession
    val root = rootFor(split(name)).getOrElse(
      throw new IllegalStateException(s"'$name' is not a registered " +
        "CDC table — call CdcSql.registerTable first"))
    feed(spark, root).getOrElse(
      throw new IllegalStateException(
        s"CDC table '$name' at $root has no committed snapshot yet"))
      .queryExecution.analyzed
  }

  /** Table-valued SQL entry points, registered by `GraftExtensions`:
    * `cdc_changes('t', since)` and `cdc_changes_between('t', from, to)`
    * — the feed re-resolved on EVERY query (the live sibling of
    * [[changesView]]'s capture-at-creation semantics).
    */
  private[graft] val tableFunctions: Seq[(
      org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    Seq(
      (FunctionIdentifier("cdc_changes"),
        new ExpressionInfo("graft.streaming.CdcSql", "cdc_changes"),
        args => {
          if (args.size != 2) throw new UnsupportedOperationException(
            "cdc_changes(name, sinceBatch) takes 2 arguments")
          val name = argString(args(0), "cdc_changes name")
          val since = argLong(args(1), "cdc_changes sinceBatch")
          feedPlan(name, CdcApply.changesSince(_, _, since))
        }),
      (FunctionIdentifier("cdc_changes_between"),
        new ExpressionInfo("graft.streaming.CdcSql",
          "cdc_changes_between"),
        args => {
          if (args.size != 3) throw new UnsupportedOperationException(
            "cdc_changes_between(name, fromBatch, toBatch) takes 3 " +
              "arguments")
          val name = argString(args(0), "cdc_changes_between name")
          val from = argLong(args(1), "cdc_changes_between fromBatch")
          val to = argLong(args(2), "cdc_changes_between toBatch")
          feedPlan(name, CdcApply.changesBetween(_, _, from, to))
        }),
      // operator introspection: every registered name with its root
      // and current watermark (NULL before the first apply) — the
      // SHOW TABLES of the registered-name surface, metadata only
      (FunctionIdentifier("cdc_tables"),
        new ExpressionInfo("graft.streaming.CdcSql", "cdc_tables"),
        args => {
          if (args.nonEmpty) throw new UnsupportedOperationException(
            "cdc_tables() takes no arguments")
          val spark = activeSession
          val rows = tables.toSeq.sortBy(_._1).map { case (n, r) =>
            (n, r, CdcApply.currentVersion(spark, r))
          }
          spark.createDataFrame(rows)
            .toDF("name", "root", "current_batch")
            .queryExecution.analyzed
        }))
  }

  /** Materialize the change feed of registered table `name` since
    * `sinceBatch` as a temp view (default `<name>_changes`) and return
    * the view name. Unlike the snapshot NAME and the `cdc_changes`
    * table function (both re-resolved every query), the view captures
    * the feed as of THIS call — re-invoke to advance; streaming
    * consumers use [[CdcApply.readChangesStream]].
    */
  def changesView(spark: SparkSession, name: String, sinceBatch: Long,
      viewName: Option[String] = None): String = {
    val parts = split(name)
    val root = rootFor(parts).getOrElse(
      throw new IllegalStateException(s"'$name' is not a registered " +
        "CDC table — call CdcSql.registerTable first"))
    val df = CdcApply.changesSince(spark, root, sinceBatch).getOrElse(
      throw new IllegalStateException(
        s"CDC table '$name' at $root has no committed snapshot yet"))
    val v = viewName.getOrElse(parts.last + "_changes")
    df.createOrReplaceTempView(v)
    v
  }
}

/** Analyzer rule expanding registered CDC table names (see [[CdcSql]]).
  * Injected by `graft.governance.GraftExtensions` into the resolution
  * batch: catalog resolution runs first in the same fixpoint, so a real
  * catalog table always shadows a registered CDC name — the rule only
  * sees identifiers the catalog left unresolved.
  */
case class CdcTableResolution(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private def cdcIdent(p: LogicalPlan): Option[String] = p match {
    case u: UnresolvedRelation
        if CdcSql.rootFor(u.multipartIdentifier).isDefined =>
      Some(u.multipartIdentifier.mkString("."))
    case _ => None
  }

  /** Metadata tables, the table-format convention: `` `t$history` ``,
    * `` `t$buckets` ``, `` `t$describe` `` resolve to the operator
    * metadata frames of registered table `t`. Like the Scala APIs they
    * name, these serve MANIFEST metadata (sizes, counts, column names,
    * commit clocks) — location governance gates cell data, not
    * metadata; gate the filesystem for metadata secrecy.
    */
  private val metaTables: Map[String,
      (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
    "history" -> ((s, r) => CdcApply.history(s, r)),
    "buckets" -> ((s, r) => CdcApply.buckets(s, r)),
    "describe" -> ((s, r) => CdcApply.describe(s, r)))

  private def metaTarget(u: UnresolvedRelation)
      : Option[(String, org.apache.spark.sql.DataFrame)] = {
    val last = u.multipartIdentifier.last
    val cut = last.lastIndexOf('$')
    if (cut <= 0) return None
    val (base, suffix) = (last.substring(0, cut), last.substring(cut + 1))
    for {
      mk <- metaTables.get(suffix.toLowerCase(Locale.ROOT))
      root <- CdcSql.rootFor(u.multipartIdentifier.init :+ base)
    } yield (last, mk(spark, root))
  }

  /** The snapshot (or time-travel) frame, freshly resolved against the
    * manifest pointer, aliased so `name.col` references resolve. The
    * nested DataFrame construction runs this session's full analysis —
    * including governance injection for governed roots — so the embedded
    * subtree arrives resolved and governance-tagged; the outer fixpoint
    * leaves it untouched.
    */
  private def expand(alias: String, snapshot: Option[
      org.apache.spark.sql.DataFrame], what: String): LogicalPlan =
    snapshot match {
      case Some(df) => SubqueryAlias(alias, df.queryExecution.analyzed)
      case None => throw new IllegalStateException(
        s"CDC table '$alias' has no readable snapshot $what")
    }

  /** `TIMESTAMP AS OF <expr>` → the engine's commit-clock millis: an
    * integer literal is taken as the logical clock verbatim (the form
    * [[CdcApply.applyBatch]]'s `commitTs` records); anything else is
    * cast to TIMESTAMP and converted micros → millis.
    */
  private def asOfMillis(e: Expression): Long = {
    val lit = e match {
      case l: Literal => l
      case other if other.foldable =>
        Literal.create(other.eval(), other.dataType)
      case other => throw new UnsupportedOperationException(
        s"TIMESTAMP AS OF over a CDC table needs a constant, got $other")
    }
    lit.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        String.valueOf(lit.value).toLong
      case _ =>
        val zone = spark.sessionState.conf.sessionLocalTimeZone
        Cast(lit, TimestampType, Some(zone)).eval() match {
          case micros: java.lang.Long => Math.floorDiv(micros, 1000L)
          case _ => throw new UnsupportedOperationException(
            s"cannot read '${lit.value}' as a timestamp")
        }
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    // TOP-DOWN: the DML guards must fire on the statement node BEFORE
    // the generic relation case expands its child (bottom-up would
    // rewrite the target into a snapshot subtree first, and the denial
    // would surface as an unrelated analysis failure)
    plan.resolveOperatorsDown {
      // DML against a registered CDC name: refused loudly — change
      // batches enter through CdcApply.applyBatch (merge semantics,
      // replay guard, change feed), which SQL DML cannot express
      case i: InsertIntoStatement if cdcIdent(i.table).isDefined =>
        throw writeDenied(cdcIdent(i.table).get)
      case d: DeleteFromTable if cdcIdent(d.table).isDefined =>
        throw writeDenied(cdcIdent(d.table).get)
      case u: UpdateTable if cdcIdent(u.table).isDefined =>
        throw writeDenied(cdcIdent(u.table).get)
      case m: MergeIntoTable if cdcIdent(m.targetTable).isDefined =>
        throw writeDenied(cdcIdent(m.targetTable).get)

      case RelationTimeTravel(u: UnresolvedRelation, ts, ver)
          if CdcSql.rootFor(u.multipartIdentifier).isDefined =>
        val root = CdcSql.rootFor(u.multipartIdentifier).get
        val alias = u.multipartIdentifier.last
        (ver, ts) match {
          case (Some(v), _) =>
            val batch =
              try v.toLong
              catch { case _: NumberFormatException =>
                throw new UnsupportedOperationException(
                  s"VERSION AS OF over CDC table '$alias' takes a " +
                    s"batch id, got '$v'")
              }
            expand(alias, CdcApply.readSnapshotAt(spark, root, batch),
              s"as of version $batch")
          case (None, Some(t)) =>
            val millis = asOfMillis(t)
            expand(alias, CdcApply.readSnapshotAsOf(spark, root, millis),
              s"as of timestamp $millis")
          case (None, None) =>
            expand(alias, CdcApply.readSnapshot(spark, root), "(empty)")
        }

      case u: UnresolvedRelation
          if !u.isStreaming &&
            CdcSql.rootFor(u.multipartIdentifier).isDefined =>
        val root = CdcSql.rootFor(u.multipartIdentifier).get
        expand(u.multipartIdentifier.last,
          CdcApply.readSnapshot(spark, root), "(empty)")

      case u: UnresolvedRelation
          if !u.isStreaming && metaTarget(u).isDefined =>
        val (alias, df) = metaTarget(u).get
        SubqueryAlias(alias, df.queryExecution.analyzed)

      // STREAMING read of a registered name tails the change feed:
      // `spark.readStream.table("orders_cdc")` expands to
      // readChangesStream's file-stream source over the changelog —
      // at-least-once delivery of every accepted event, deletes as
      // flagged rows, the consumer's checkpoint tracking position.
      // Tables without a changelog refuse with the remedy.
      case u: UnresolvedRelation
          if u.isStreaming &&
            CdcSql.rootFor(u.multipartIdentifier).isDefined =>
        val name = u.multipartIdentifier.mkString(".")
        val root = CdcSql.rootFor(u.multipartIdentifier).get
        CdcApply.readChangesStream(spark, root) match {
          case Some(df) => SubqueryAlias(u.multipartIdentifier.last,
            df.queryExecution.analyzed)
          case None => throw new UnsupportedOperationException(
            s"streaming read of CDC table '$name' needs its changelog: " +
              "apply with changelog = true (readChangesStream contract)")
        }
    }

  private def writeDenied(name: String): Throwable =
    new UnsupportedOperationException(
      s"CDC table '$name' is written through CdcApply.applyBatch, " +
        "not SQL DML — applies carry the merge/replay/change-feed " +
        "semantics a raw INSERT/UPDATE/DELETE/MERGE would bypass")
}
