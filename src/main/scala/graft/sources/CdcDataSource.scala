package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SaveMode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

import graft.streaming.CdcApply

/** `spark.read.format("cdc")` — the third entry point to CDC tables
  * beside the Scala API ([[graft.streaming.CdcApply.readSnapshot]])
  * and the registered-name SQL surface ([[graft.streaming.CdcSql]]),
  * for tools that speak only the DataFrameReader format/option
  * protocol (the reference's consumers hand connection strings to an
  * engine, `outputs.tf:41-55`; a format name is Spark's analog).
  *
  * Options: `path` (the table root, required), and at most one of
  * `versionAsOf` (batch id) / `timestampAsOf` (commit-clock millis) —
  * the same time-travel addressing as `VERSION AS OF` / `TIMESTAMP AS
  * OF` over a registered name.
  *
  * The relation delegates to the engine's own snapshot plan and hands
  * Spark its internal rows directly (`needConversion = false` — no
  * row-format copy), with column pruning and the common filter shapes
  * pushed into that plan, where they reach the parquet scans as usual.
  * The seam is still a `RowDataSourceScanExec` boundary, which caps
  * whole-stage codegen around the scan — perf-critical readers use the
  * name surface or the Scala API, which plan the scan natively; this
  * shim trades that last mile for protocol compatibility and says so.
  *
  * WRITES route through the engine's own apply path, never around it:
  * `df.write.format("cdc").mode("append")` with `option("keys", ...)`
  * + `option("versionCol", ...)` IS [[CdcApply.applyBatch]] — merge
  * semantics, bucket layout, replay guard, writer fence, and
  * governance all hold, because the save is the apply. Optional
  * options mirror the Scala parameters: `batchId` (omit = next batch;
  * EXPLICIT ids are what make retried writes idempotent through the
  * replay guard — an omitted id re-applies a retry as a new batch),
  * `deletedCol`, `numBuckets`, `maxDeltas`, `bucketCols` (csv),
  * `changelog`, `commitTs`. Every other SaveMode is refused loudly:
  * Overwrite would erase history (use restore/vacuum), and
  * ErrorIfExists/Ignore have no merge meaning.
  */
class CdcDataSource extends RelationProvider
    with CreatableRelationProvider with StreamSinkProvider
    with StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "cdc"

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val root = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "format(\"cdc\") requires option(\"path\", <table root>)"))
    val version = parameters.get("versionAsOf").map(_.toLong)
    val asOf = parameters.get("timestampAsOf").map(_.toLong)
    require(version.isEmpty || asOf.isEmpty,
      "versionAsOf and timestampAsOf are mutually exclusive")
    val snap = ((version, asOf) match {
      case (Some(v), _) => CdcApply.readSnapshotAt(spark, root, v)
      case (_, Some(t)) => CdcApply.readSnapshotAsOf(spark, root, t)
      case _ => CdcApply.readSnapshot(spark, root)
    }).getOrElse(throw new IllegalStateException(
      s"CDC table at $root has no readable snapshot " +
        version.map(v => s"as of version $v")
          .orElse(asOf.map(t => s"as of timestamp $t")).getOrElse("")))
    CdcRelation(sqlContext, snap)
  }

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val root = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "format(\"cdc\") requires option(\"path\", <table root>)"))
    if (mode != SaveMode.Append)
      throw new UnsupportedOperationException(
        s"format(\"cdc\") supports mode(\"append\") only (a save IS a " +
          "CdcApply.applyBatch — merge semantics have no " +
          s"$mode meaning; history rewrites go through " +
          "restore/vacuum)")
    val batchId = parameters.get("batchId").map(_.toLong).getOrElse(
      CdcApply.currentVersion(spark, root).map(_ + 1L).getOrElse(0L))
    CdcDataSource.applyResolved(spark, root, parameters, data, batchId)
    createRelation(sqlContext, Map("path" -> root))
  }

  /** `df.writeStream.format("cdc")` — the streaming twin of the batch
    * writer above, completing the format protocol for streams: each
    * micro-batch IS a [[CdcApply.applyBatch]], so merge semantics,
    * bucket layout, writer fence, governance AND exactly-once all
    * hold. Exactly-once comes from the engine pair: the streaming
    * engine replays an epoch after a crash with the SAME epoch id, and
    * the CDC replay guard no-ops a batch id at-or-below the table's
    * watermark — so a replayed epoch is dropped, not double-applied
    * (EventStreamSpec). Epoch ids map to CDC batch ids as
    * `baseBatchId + epoch` (default base 0 — right for a table the
    * stream owns from batch 0; appending a stream to a table with
    * prior history needs an explicit `baseBatchId` ABOVE that history,
    * stable across restarts, which an at-start default could not be).
    *
    * Append and Update modes both deliver "rows that changed this
    * epoch" — exactly applyBatch's input contract. Complete mode is
    * refused: re-merging the full result every epoch would record
    * unchanged rows as fresh versions.
    */
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    val root = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "format(\"cdc\") requires option(\"path\", <table root>)"))
    require(partitionColumns.isEmpty,
      "format(\"cdc\") sink: CDC tables bucket by key — partitionBy " +
        "has no meaning here (use bucketCols)")
    if (outputMode == OutputMode.Complete())
      throw new UnsupportedOperationException(
        "format(\"cdc\") sink supports Append/Update output modes " +
          "(a micro-batch is a change batch; Complete would re-merge " +
          "unchanged rows as fresh versions)")
    new CdcSink(sqlContext.sparkSession, root, parameters,
      parameters.get("baseBatchId").map(_.toLong).getOrElse(0L))
  }

  /** `spark.readStream.format("cdc")` — the streaming READ completing
    * the format-protocol matrix (batch read/write and the streaming
    * sink above): tails the table's changelog like
    * [[CdcApply.readChangesStream]], but as a first-class V1 `Source`
    * whose offset IS the applied batch id — so the consumer's
    * checkpoint records "read through batch N" directly, a micro-batch
    * maps 1:1 to one or more APPLIED batches, and only changelog dirs
    * with a complete `_SUCCESS` marker ever advance the offset (a dir
    * listed mid-write is invisible). Delivery semantics are the
    * changelog's: at-least-once of every accepted event, deletes as
    * deletedCol-flagged rows, vacuum sweeps dropped batches' logs —
    * size retention to the slowest consumer. The schema is declared
    * from the manifest at stream start (restart to surface an additive
    * evolution). Requires a changelog-enabled table with at least one
    * schema-bearing commit.
    */
  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    ("cdc", feedSchemaOf(sqlContext, parameters))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String])
      : org.apache.spark.sql.execution.streaming.Source = {
    val root = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "format(\"cdc\") requires option(\"path\", <table root>)"))
    new CdcChangelogSource(sqlContext.sparkSession, root,
      feedSchemaOf(sqlContext, parameters))
  }

  private def feedSchemaOf(sqlContext: SQLContext,
      parameters: Map[String, String]): StructType = {
    val root = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "format(\"cdc\") requires option(\"path\", <table root>)"))
    CdcApply.changeFeedSchema(sqlContext.sparkSession, root)
      .getOrElse(throw new IllegalStateException(
        s"readStream.format(\"cdc\"): no schema-bearing CDC commit at " +
          s"$root yet — apply a changelog-enabled batch first (the " +
          "file-stream schema must be declared, not inferred)"))
  }
}

/** The V1 streaming source: offsets are applied batch ids. getBatch
  * reads exactly the (start, end] changelog directories as ordinary
  * parquet and re-brands the frame streaming via the engine's own
  * `internalCreateDataFrame` (reached reflectively — `private[sql]`
  * is public in bytecode; the same pragmatic seam as the governance
  * rule's FileStreamSink path recovery).
  */
private[sources] class CdcChangelogSource(
    spark: org.apache.spark.sql.SparkSession, root: String,
    feedSchema: StructType)
    extends org.apache.spark.sql.execution.streaming.Source {

  import org.apache.spark.sql.execution.streaming.{Offset => V1Offset}
  import org.apache.spark.sql.execution.streaming.runtime.LongOffset

  override def schema: StructType = feedSchema

  override def getOffset: Option[V1Offset] =
    CdcApply.changelogBatchIds(spark, root) match {
      case ids if ids.isEmpty => None
      case ids => Some(LongOffset(ids.max))
    }

  private def idOf(o: V1Offset): Long = o match {
    case l: LongOffset => l.offset
    // a checkpoint-recovered offset arrives serialized; LongOffset's
    // json form is the bare number
    case other => other.json.trim.toLong
  }

  override def getBatch(start: Option[V1Offset],
      end: V1Offset): org.apache.spark.sql.DataFrame = {
    val lo = start.map(idOf)
    val hi = idOf(end)
    val ids = CdcApply.changelogBatchIds(spark, root)
      .filter(id => id <= hi && lo.forall(id > _))
    val rdd =
      if (ids.isEmpty)
        spark.sparkContext
          .emptyRDD[org.apache.spark.sql.catalyst.InternalRow]
      else
        spark.read.schema(feedSchema)
          .parquet(ids.map(id => s"$root/changelog/b$id"): _*)
          .queryExecution.toRdd
    val m = spark.getClass.getMethod("internalCreateDataFrame",
      classOf[org.apache.spark.rdd.RDD[_]], classOf[StructType],
      java.lang.Boolean.TYPE)
    m.invoke(spark, rdd, feedSchema, java.lang.Boolean.TRUE)
      .asInstanceOf[org.apache.spark.sql.DataFrame]
  }

  override def stop(): Unit = ()

  override def toString: String = s"CdcChangelogSource[$root]"
}

private[sources] object CdcDataSource {

  /** Shared append path for the batch save and the streaming sink.
    * Appends to an EXISTING table default every layout/config knob
    * from the current manifest (the deleteWhere/updateWhere pattern):
    * applyBatch's config gate compares all of them, so a bare
    * df.write append must present the table's own values, not the
    * Scala-API defaults. Explicit options still override (and then
    * the gate rejects a genuine mismatch loudly).
    */
  /** Returns applyBatch's applied/no-op result — the sink's
    * swallowed-epoch detector reads it. */
  private[sources] def applyResolved(spark: org.apache.spark.sql.SparkSession,
      root: String, parameters: Map[String, String], data: DataFrame,
      batchId: Long): Boolean = {
    val conf = CdcApply.tableConfOf(spark, root)
    val keys = parameters.get("keys")
      .map(_.split(',').map(_.trim).toSeq.filter(_.nonEmpty))
      .filter(_.nonEmpty)
      .orElse(conf.map(_.keys))
      .getOrElse(throw new IllegalArgumentException(
        "format(\"cdc\") append requires option(\"keys\", \"k1[,k2]\")"))
    val versionCol = parameters.get("versionCol")
      .orElse(conf.map(_.versionCol))
      .getOrElse(throw new IllegalArgumentException(
        "format(\"cdc\") append requires option(\"versionCol\", <col>)"))
    // changelog-enabled tables keep their changelog fed on a bare
    // append (streaming tails must not silently diverge from the
    // manifest feed) — same detection as deleteWhere/updateWhere
    val logged = parameters.get("changelog").map(_.toBoolean).getOrElse(
      CdcApply.hasChangelog(spark, root))
    val applied = CdcApply.applyBatch(data, batchId, root, keys, versionCol,
      parameters.get("deletedCol").orElse(conf.flatMap(_.deletedCol)),
      numBuckets = parameters.get("numBuckets").map(_.toInt)
        .orElse(conf.map(_.numBuckets)).getOrElse(16),
      tombstoneRetention = parameters.get("retention").map(_.toInt)
        .orElse(conf.map(_.retention))
        .getOrElse(CdcApply.DefaultTombstoneRetention),
      commitTs = parameters.get("commitTs").map(_.toLong),
      changelog = logged,
      maxDeltas = parameters.get("maxDeltas").map(_.toInt)
        .orElse(conf.map(_.maxDeltas)).getOrElse(0),
      bucketCols = parameters.get("bucketCols")
        .map(_.split(',').map(_.trim).toSeq.filter(_.nonEmpty))
        .orElse(conf.flatMap(_.bucketKeys)))
    applied
  }
}

/** The V1 streaming sink: epoch → [[CdcApply.applyBatch]]. The
  * micro-batch frame the engine hands `addBatch` carries an
  * incremental-execution plan that must not be re-analyzed, so the
  * rows are re-planned as an ordinary DataFrame first (one
  * InternalRow→Row conversion at the protocol seam — the write-side
  * twin of the read relation's documented codegen boundary;
  * throughput-critical streams use `foreachBatch` + the Scala API,
  * which skips it). Options re-resolve against the manifest EVERY
  * epoch: the table's conf evolves as batches commit, and the first
  * epoch may be the one that creates the table.
  */
private[sources] class CdcSink(spark: org.apache.spark.sql.SparkSession,
    root: String, parameters: Map[String, String], base: Long)
    extends Sink {

  // Table head when THIS sink instance started. Epochs at or below it
  // are checkpoint replays of batches a previous incarnation already
  // committed — the replay guard's legitimate no-op. Epochs ABOVE it
  // are new work this instance must genuinely apply, so if the head has
  // meanwhile advanced past one (an interleaved deleteWhere/updateWhere
  // auto-commit at head+1, a cdc_apply at its default slot, another
  // writer), applyBatch's replay guard would SILENTLY swallow the
  // micro-batch as a replay — silent data loss. The guard below turns
  // that into a loud failure instead: DML must not interleave with an
  // active cdc sink's batch-id range.
  private val headAtStart: Long =
    CdcApply.currentVersion(spark, root).getOrElse(-1L)

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val target = base + batchId
    val schema = data.schema
    val rows = data.queryExecution.toRdd.mapPartitions { it =>
      val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
        .createToScalaConverter(schema)
      it.map(ir => conv(ir.copy()).asInstanceOf[Row])
    }
    val applied = CdcDataSource.applyResolved(spark, root, parameters,
      spark.createDataFrame(rows, schema), target)
    // swallowed-epoch detector, AFTER the apply so no check-then-act
    // window remains: an epoch ABOVE the head this sink started at is
    // new work that must genuinely apply; if the replay guard no-op'd
    // it, an interleaved writer (deleteWhere/updateWhere auto-commit,
    // cdc_apply, another stream) took its batch-id slot — throwing
    // here keeps the engine from committing the checkpoint offset, so
    // the failure is loud instead of silent data loss. Epochs at or
    // below headAtStart are checkpoint replays of batches a previous
    // incarnation committed — the legitimate no-op.
    if (!applied && target > headAtStart)
      throw new IllegalStateException(
        s"cdc sink epoch $batchId maps to table batch $target of " +
          s"$root, but the replay guard swallowed it (head is " +
          s"${CdcApply.currentVersion(spark, root).getOrElse(-1L)}) " +
          "and this query never applied that epoch — an interleaved " +
          "writer took the slot. Stop interleaved DML while the sink " +
          "runs, or restart with a baseBatchId above the intruder.")
  }
}

/** The snapshot as a pruned-filtered relation: pruning and the
  * translatable filters are applied INSIDE the delegated snapshot
  * DataFrame (reaching its parquet scans through the ordinary
  * optimizer), untranslatable filters are reported unhandled so Spark
  * re-applies them above the scan.
  */
private[sources] case class CdcRelation(sqlContext: SQLContext,
    snap: DataFrame) extends BaseRelation with PrunedFilteredScan {

  override def schema: StructType = snap.schema

  // plan-derived size instead of BaseRelation's "assume huge" default:
  // the delegated snapshot plan already carries file-size (and, for
  // registered CDC names, manifest row-count) statistics — reporting
  // them here lets a small dimension table served through the format
  // shim broadcast like any parquet read would
  override def sizeInBytes: Long = {
    val s = snap.queryExecution.optimizedPlan.stats.sizeInBytes
    if (s > BigInt(Long.MaxValue)) Long.MaxValue else s.toLong
  }

  // rows leave as InternalRow straight from the delegated plan — no
  // Row conversion copy on the scan boundary
  override def needConversion: Boolean = false

  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters.filter(toColumn(_).isEmpty)

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val filtered = filters.flatMap(toColumn)
      .foldLeft(snap)((df, c) => df.filter(c))
    val pruned =
      if (requiredColumns.isEmpty)
        // COUNT(*)-style scans need row multiplicity, not columns
        filtered.select(org.apache.spark.sql.functions.lit(1))
      else filtered.select(requiredColumns.map(col).toIndexedSeq: _*)
    pruned.queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }

  /** The filter shapes with exact Column equivalents; None marks the
    * rest unhandled (Spark re-applies them above the scan, so a gap
    * here costs performance, never correctness).
    */
  private def toColumn(f: Filter): Option[org.apache.spark.sql.Column] =
    f match {
      case EqualTo(a, v) => Some(col(a) === v)
      case EqualNullSafe(a, v) => Some(col(a) <=> v)
      case GreaterThan(a, v) => Some(col(a) > v)
      case GreaterThanOrEqual(a, v) => Some(col(a) >= v)
      case LessThan(a, v) => Some(col(a) < v)
      case LessThanOrEqual(a, v) => Some(col(a) <= v)
      case In(a, vs) => Some(col(a).isInCollection(vs.toSeq))
      case IsNull(a) => Some(col(a).isNull)
      case IsNotNull(a) => Some(col(a).isNotNull)
      case StringStartsWith(a, p) => Some(col(a).startsWith(p))
      case StringEndsWith(a, p) => Some(col(a).endsWith(p))
      case StringContains(a, p) => Some(col(a).contains(p))
      case Not(c) => toColumn(c).map(!_)
      case And(l, r) =>
        for (lc <- toColumn(l); rc <- toColumn(r)) yield lc && rc
      case Or(l, r) =>
        for (lc <- toColumn(l); rc <- toColumn(r)) yield lc || rc
      case _ => None
    }
}
