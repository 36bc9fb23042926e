package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan,
  Project, UnaryNode}
import org.apache.spark.sql.catalyst.rules.Rule

/** Resolved PASS-THROUGH marker the `delta_scan` / `iceberg_scan`
  * SQL table functions wrap around their analysis-time expansion: it
  * records WHICH foreign table (format, path, pinned version) the
  * subtree came from, so [[ForeignScanPrune]] can re-resolve the read
  * with the enclosing query's predicates once the optimizer has
  * pushed them down to sit directly above it. The node contributes
  * nothing at runtime — [[ForeignScanStrip]] removes every survivor
  * before physical planning.
  *
  * Why a marker instead of pruning at expansion time: a table
  * function expands DURING analysis, when the enclosing `WHERE` has
  * not yet been resolved, split, or pushed — the only place the scan
  * and its predicates meet is the optimizer.
  */
case class ForeignScan(format: String, path: String,
    version: Option[Long], timestampAsOf: Option[Long],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(
      newChild: LogicalPlan): ForeignScan = copy(child = newChild)
}

/** Optimizer rule (operator-optimization fixed point, so it runs
  * AFTER predicate pushdown has moved filters adjacent): a `Filter`
  * directly above a [[ForeignScan]] re-resolves the read through the
  * protocol reader with the supported conjuncts as the metadata-level
  * pruning predicate — a SQL `WHERE k < 3` over `delta_scan('/t')`
  * gets the same file skipping (partition values, add-action stats,
  * Iceberg bounds) a Scala `option("filter", ...)` caller gets. The
  * FULL condition stays as the row filter above, and the reader
  * re-applies the pruning predicate too, so results can never change
  * (the pruned file set is a conservative superset by [[
  * graft.sources.MetaPrune]]'s contract). Conjunct shapes mirror what
  * the readers can prune — `col OP literal`, `col IS [NOT] NULL` —
  * anything else is simply not handed over.
  */
case class ForeignScanPrune(session: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  private def quote(n: String) = "`" + n.replace("`", "``") + "`"

  /** SQL rendering of one prunable conjunct over the scan's own
    * columns; None leaves the conjunct to the row filter alone.
    * Rendered from the matched parts (bare column name + literal
    * SQL), never `expr.sql` — qualified attribute renderings would
    * parse as multi-part names the pruners treat as unsupported.
    */
  private def conjunctSql(e: Expression,
      scanOut: AttributeSet): Option[String] = {
    def ok(a: Attribute, l: Literal): Boolean =
      scanOut.contains(a) && l.value != null
    e match {
      case EqualTo(a: AttributeReference, l: Literal) if ok(a, l) =>
        Some(s"${quote(a.name)} = ${l.sql}")
      case EqualTo(l: Literal, a: AttributeReference) if ok(a, l) =>
        Some(s"${quote(a.name)} = ${l.sql}")
      case LessThan(a: AttributeReference, l: Literal) if ok(a, l) =>
        Some(s"${quote(a.name)} < ${l.sql}")
      case LessThan(l: Literal, a: AttributeReference) if ok(a, l) =>
        Some(s"${quote(a.name)} > ${l.sql}")
      case LessThanOrEqual(a: AttributeReference, l: Literal)
          if ok(a, l) =>
        Some(s"${quote(a.name)} <= ${l.sql}")
      case LessThanOrEqual(l: Literal, a: AttributeReference)
          if ok(a, l) =>
        Some(s"${quote(a.name)} >= ${l.sql}")
      case GreaterThan(a: AttributeReference, l: Literal) if ok(a, l) =>
        Some(s"${quote(a.name)} > ${l.sql}")
      case GreaterThan(l: Literal, a: AttributeReference) if ok(a, l) =>
        Some(s"${quote(a.name)} < ${l.sql}")
      case GreaterThanOrEqual(a: AttributeReference, l: Literal)
          if ok(a, l) =>
        Some(s"${quote(a.name)} >= ${l.sql}")
      case GreaterThanOrEqual(l: Literal, a: AttributeReference)
          if ok(a, l) =>
        Some(s"${quote(a.name)} <= ${l.sql}")
      case In(a: AttributeReference, es)
          if scanOut.contains(a) && es.nonEmpty && es.forall {
            case l: Literal => l.value != null
            case _ => false
          } =>
        // InSet (the >threshold optimizer form) is NOT rendered —
        // its values are internal representations; IN lists past
        // spark.sql.optimizer.inSetConversionThreshold simply skip
        // file pruning (row filter still applies)
        Some(s"${quote(a.name)} IN (${es.map {
          case l: Literal => l.sql }.mkString(", ")})")
      case IsNull(a: AttributeReference) if scanOut.contains(a) =>
        Some(s"${quote(a.name)} IS NULL")
      case IsNotNull(a: AttributeReference) if scanOut.contains(a) =>
        Some(s"${quote(a.name)} IS NOT NULL")
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    plan.transformDown {
      case f @ Filter(cond, fs: ForeignScan) =>
        val conjs = splitConjunctivePredicates(cond)
          .flatMap(conjunctSql(_, fs.outputSet))
        if (conjs.isEmpty)
          // nothing prunable YET — leave the marker in place: early
          // fixed-point iterations see unfolded shapes (`id >=
          // cast(10 as bigint)`) that ConstantFolding simplifies a
          // pass later; [[ForeignScanStrip]] sweeps markers whose
          // filters never become prunable
          f
        else {
          val whereSql = conjs.mkString(" AND ")
          // re-resolve the read WITH the pruning predicate; any
          // failure (e.g. the table changed shape under us) falls
          // back to the already-resolved unpruned subtree
          val attempt = scala.util.Try {
            (fs.format match {
              case "delta" =>
                graft.sources.DeltaInterop.readDelta(session, fs.path,
                  fs.version, Some(whereSql), fs.timestampAsOf)
              case "iceberg" =>
                graft.sources.IcebergInterop.readIceberg(session,
                  fs.path, fs.version, Some(whereSql))
            }).queryExecution.analyzed
          }
          attempt.failed.foreach(e => logWarning(
            s"foreign-scan pruning re-read of ${fs.format} table " +
              s"${fs.path} failed (${e.getMessage}); serving the " +
              "unpruned subtree — results are unaffected, only file " +
              "skipping is lost"))
          val reread = attempt.toOption
          // graft the fresh subtree under the OLD output ids so every
          // reference above keeps resolving. The marker's output may
          // already be COLUMN-PRUNED (a Project pushed through it),
          // so match the re-read's columns BY NAME and re-project to
          // exactly the marker's (possibly narrower) output.
          val mapped: Option[Seq[NamedExpression]] = reread.flatMap {
            p =>
              val byName = p.output.map(a => a.name -> a).toMap
              val cols = fs.output.map(o => byName.get(o.name)
                .filter(_.dataType == o.dataType)
                .map(n => Alias(n, o.name)(exprId = o.exprId)))
              if (cols.forall(_.isDefined)) Some(cols.flatten)
              else None
          }
          (mapped, reread) match {
            case (Some(cols), Some(p)) =>
              Filter(cond, Project(cols, p))
            case _ => Filter(cond, fs.child)
          }
        }
    }
  }
}

/** Pre-CBO sweep: any [[ForeignScan]] marker no filter ever landed on
  * contributes nothing — replace it with its child before the
  * remaining optimizer batches and physical planning.
  */
case class ForeignScanStrip(session: SparkSession)
    extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp { case fs: ForeignScan => fs.child }
}
