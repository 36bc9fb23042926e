package graft.governance

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.catalog.CatalogTable
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.command.{CreateDataSourceTableAsSelectCommand, DropTableCommand, InsertIntoDataSourceDirCommand, TruncateTableCommand}
import org.apache.spark.sql.execution.datasources.{InsertIntoDataSourceCommand, InsertIntoHadoopFsRelationCommand, SaveIntoDataSourceCommand}

/** Thrown when a principal without write grants targets a governed
  * table — the Spark analog of Lake Formation rejecting a write by a
  * SELECT-only principal (reference `main.tf:473-487` grants the
  * Analyst the data-cells filter only; ALL — including write — is held
  * solely by the DataAdmin, `main.tf:460-470`).
  */
class AccessDeniedException(msg: String) extends RuntimeException(msg)

/** Plan-time WRITE enforcement, the missing half of read governance: an
  * analysis CHECK rule (injected via `SparkSessionExtensions
  * .injectCheckRule`) that rejects any mutation whose target is a
  * governed table — SQL `INSERT INTO`/`INSERT OVERWRITE`, CTAS over a
  * governed identity or location, `df.write.insertInto`/`saveAsTable`,
  * a direct `df.write.parquet(<governed location>)`, `DROP TABLE`, and
  * `TRUNCATE TABLE` — unless the session principal is the DataAdmin.
  *
  * The choke point is the same as the read rule's: analysis of the
  * command's `QueryExecution`, which every execution path funnels
  * through (SQL text, DataFrameWriter, streaming `foreachBatch`
  * bodies). Denials throw [[AccessDeniedException]] BEFORE any physical
  * planning or file I/O and leave an audit record, so a governed table
  * cannot even be partially overwritten by a denied principal.
  */
case class GovernanceWriteCheck(spark: SparkSession)
    extends (LogicalPlan => Unit) {

  private def principal: Principal =
    Principal.fromName(spark.conf.get(GovernanceRule.PrincipalConf,
      Anonymous.name))

  private def governedIdent(ident: TableIdentifier): Option[(String, String)] =
    ident.database
      .orElse(Some(spark.sessionState.catalog.getCurrentDatabase))
      .map(db => (db, ident.table))
      .filter { case (db, t) => GovernanceCatalog.isGoverned(db, t) }

  private def governedPath(path: String): Option[(String, String)] =
    GovernanceCatalog.tableForLocation(path)

  /** True when the sink is a file-based streaming sink: the v1
    * `FileStreamSink` class (the only file sink `DataStreamWriter`
    * constructs), matched by class name, with its `FileSink[<path>]`
    * debug form as a second signal so a relocated class is still
    * recognized.
    */
  private[graft] def isFileSink(sink: AnyRef): Boolean =
    sink.getClass.getName.endsWith(".FileStreamSink") ||
      String.valueOf(sink).startsWith("FileSink[")

  /** Output path of a file-based streaming sink, recovered
    * STRUCTURALLY: the sink's `path` field read reflectively (it is
    * construction-private), falling back to parsing the `FileSink[
    * <path>]` debug form. None when neither works.
    */
  private[graft] def fileSinkPath(sink: AnyRef): Option[String] =
    (try {
      val f = sink.getClass.getDeclaredField("path")
      f.setAccessible(true)
      Option(f.get(sink)).map(_.toString)
    } catch {
      case _: ReflectiveOperationException | _: SecurityException => None
    }).orElse {
      val s = String.valueOf(sink)
      if (s.startsWith("FileSink[") && s.endsWith("]"))
        Some(s.stripPrefix("FileSink[").stripSuffix("]"))
      else None
    }

  /** Governed identity a streaming sink writes into: a governed catalog
    * table (`writeStream.toTable`) or a file sink whose path falls
    * under a governed location (`writeStream.format("parquet")
    * .option("path", ...)`). A sink that is recognizably a FILE sink
    * but whose path cannot be recovered — say a Spark upgrade renamed
    * the field AND changed the debug form — fails CLOSED: a synthetic
    * identity is returned so non-admin writes are denied rather than
    * silently allowed past the registry (an unextractable path might be
    * governed; only the DataAdmin may find out by writing).
    */
  private[graft] def streamingSinkTarget(
      sink: org.apache.spark.sql.connector.catalog.Table,
      catalogTable: Option[CatalogTable],
      ident: Option[Identifier]): Option[(String, String)] =
    catalogTable.flatMap(t => governedIdent(t.identifier))
      .orElse(ident.filter(_.namespace().nonEmpty).flatMap(id =>
        governedIdent(TableIdentifier(id.name(),
          Some(id.namespace().last)))))
      .orElse {
        if (!isFileSink(sink)) None
        else fileSinkPath(sink) match {
          case Some(p) => governedPath(p)
          case None =>
            Some(("(unresolved file-sink path)", sink.getClass.getName))
        }
      }

  /** The governed identity this write targets, if any. */
  private def target(plan: LogicalPlan): Option[(String, String)] =
    plan match {
      case i: InsertIntoHadoopFsRelationCommand =>
        i.catalogTable.flatMap(t => governedIdent(t.identifier))
          .orElse(governedPath(i.outputPath.toString))
      case c: CreateDataSourceTableAsSelectCommand =>
        governedIdent(c.table.identifier)
          .orElse(c.table.storage.locationUri
            .flatMap(u => governedPath(u.toString)))
      case i: InsertIntoDataSourceCommand =>
        i.logicalRelation.catalogTable
          .flatMap(t => governedIdent(t.identifier))
      case i: InsertIntoDataSourceDirCommand =>
        i.storage.locationUri.flatMap(u => governedPath(u.toString))
      case s: SaveIntoDataSourceCommand =>
        s.options.get("path").flatMap(governedPath)
      // streaming writes: the sink never appears in any per-batch plan
      // (FileStreamSink invokes the writer directly), so the choke point
      // is the WriteToStream(Statement) plan analyzed ONCE at
      // query-start — denial happens before the stream ever runs
      case w: org.apache.spark.sql.catalyst.streaming.WriteToStreamStatement =>
        streamingSinkTarget(w.sink, w.catalogTable,
          w.catalogAndIdent.map(_._2))
      case w: org.apache.spark.sql.catalyst.streaming.WriteToStream =>
        streamingSinkTarget(w.sink, w.catalogTable,
          w.catalogAndIdent.map(_._2))
      case d: DropTableCommand => governedIdent(d.tableName)
      case t: TruncateTableCommand => governedIdent(t.tableName)
      // DROP TABLE analyzes to the V2 command form even on the session
      // catalog (ResolveSessionCatalog no longer downgrades it)
      case d: org.apache.spark.sql.catalyst.plans.logical.DropTable =>
        d.child match {
          case ri: org.apache.spark.sql.catalyst.analysis.ResolvedIdentifier
              if ri.identifier.namespace().nonEmpty =>
            governedIdent(TableIdentifier(ri.identifier.name(),
              Some(ri.identifier.namespace().last)))
          case _ => None
        }
      // DROP DATABASE [CASCADE] destroys every table in the namespace —
      // denying DROP TABLE while allowing the enclosing drop would be a
      // side door. Denied whenever the database HOLDS a governed table
      // (cascade or not: the non-cascade form still signals intent
      // against governed storage and fails closed).
      case d: org.apache.spark.sql.catalyst.plans.logical.DropNamespace =>
        d.namespace match {
          case rn: org.apache.spark.sql.catalyst.analysis.ResolvedNamespace
              if rn.namespace.nonEmpty =>
            GovernanceCatalog.governedTableInDb(rn.namespace.last)
          case _ => None
        }
      case d: org.apache.spark.sql.execution.command.DropDatabaseCommand =>
        GovernanceCatalog.governedTableInDb(d.databaseName)
      case _ => None
    }

  override def apply(plan: LogicalPlan): Unit =
    // write commands sit at the plan root; a root match keeps the check
    // O(1) on the read path every query also runs through
    target(plan).foreach { case (db, t) =>
      val p = principal
      if (p != DataAdmin) {
        AuditLog.record(AuditEvent("write-denied", p.name,
          Seq(s"$db.$t"), governed = true, rowsOut = None,
          durationNs = 0L, error = Some("write denied")))
        throw new AccessDeniedException(
          s"principal ${p.name} may not write governed table $db.$t " +
            "(only DataAdmin holds write access)")
      }
    }
}
