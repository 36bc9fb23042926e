package graft.sources

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister,
  RelationProvider, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** `spark.read.format("delta")` / `format("iceberg")` — reader shims
  * completing the format-protocol matrix for the two interop seams
  * (the `format("cdc")` pattern pointed at the open formats): tools
  * that speak only the DataFrameReader protocol read this engine's
  * exports — or any conformant writer's tables — without touching the
  * Scala API. Each shim resolves the table through the engine's own
  * protocol reader ([[DeltaInterop.readDelta]] /
  * [[IcebergInterop.readIceberg]]) and serves it through the same
  * pruned-filtered relation as the cdc shim, so column pruning and
  * the common filter shapes reach the underlying parquet scans.
  *
  * Short names: each shim registers TWO names — the convenience
  * `delta`/`iceberg` for the zero-dependency deployment this engine
  * targets, and a collision-proof `graft-delta`/`graft-iceberg`
  * alias. Were a real delta-spark or iceberg-runtime jar on the
  * classpath, `format("delta")`/`format("iceberg")` becomes a
  * multiple-sources ambiguity error for EVERY caller — the stable
  * API is therefore the `graft-*` name (or the fully-qualified
  * `format("graft.sources.DeltaTableSource")`), with the bare names
  * kept as sugar that works until a competing registration appears.
  *
  * Writes go through the export APIs (an export is a protocol COMMIT
  * with crash-window handling — not a blind file save), so the shims
  * are read-only on purpose.
  */
class DeltaTableSource extends RelationProvider with DataSourceRegister
    with StreamSourceProvider {

  override def shortName(): String = "delta"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "format(\"delta\") requires option(\"path\", <table dir>)"))

  /** `spark.readStream.format("graft-delta")` — tail a foreign Delta
    * log as a stream: offset = log version, the first micro-batch is
    * the table's live snapshot at stream start, every later one is
    * exactly the adds of the newly committed versions
    * ([[DeltaInterop.tailAdds]]; non-append commits refuse loudly).
    * A checkpointed restart resumes at the recorded version —
    * appends arrive exactly once by version.
    */
  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), DeltaInterop.streamSchema(
      sqlContext.sparkSession, pathOf(parameters)))

  override def createSource(sqlContext: SQLContext,
      metadataPath: String, schema: Option[StructType],
      providerName: String, parameters: Map[String, String])
      : org.apache.spark.sql.execution.streaming.Source =
    new DeltaStreamSource(sqlContext.sparkSession, pathOf(parameters))

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "format(\"delta\") requires option(\"path\", <table dir>)"))
    // option("versionAsOf", n) / option("timestampAsOf", <ISO-8601 or
    // epoch millis>) = Delta time travel; option("filter",
    // <sql predicate>) = row filter + metadata-level file pruning
    // (exact on partition values, conservative on add-action stats)
    val versionAsOf = parameters.get("versionAsOf").map(_.toLong)
    val timestampAsOf = parameters.get("timestampAsOf").map { s =>
      if (s.forall(_.isDigit)) s.toLong
      else scala.util.Try(java.time.Instant.parse(s).toEpochMilli)
        .orElse(scala.util.Try(java.time.LocalDateTime
          .parse(s.replace(' ', 'T'))
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli))
        .getOrElse(throw new IllegalArgumentException(
          s"timestampAsOf '$s' — use epoch millis, ISO-8601, or " +
            "'yyyy-MM-dd HH:mm:ss' (UTC)"))
    }
    val filter = parameters.get("filter")
    CdcRelation(sqlContext,
      DeltaInterop.readDelta(sqlContext.sparkSession, path,
        versionAsOf, filter, timestampAsOf))
  }
}

class IcebergTableSource extends RelationProvider
    with DataSourceRegister with StreamSourceProvider {

  override def shortName(): String = "iceberg"

  private def icePathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "format(\"iceberg\") requires option(\"path\", <table dir>)"))

  /** `spark.readStream.format("graft-iceberg")` — tail an Iceberg
    * tree as a stream: offset = metadata version, first micro-batch
    * is the live snapshot at stream start, later ones are exactly the
    * data files added by new commits ([[IcebergInterop.tailAdds]];
    * non-append commits refuse loudly). Checkpointed restarts resume
    * at the recorded metadata version.
    */
  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), IcebergInterop.streamSchema(
      sqlContext.sparkSession, icePathOf(parameters)))

  override def createSource(sqlContext: SQLContext,
      metadataPath: String, schema: Option[StructType],
      providerName: String, parameters: Map[String, String])
      : org.apache.spark.sql.execution.streaming.Source =
    new IcebergStreamSource(sqlContext.sparkSession,
      icePathOf(parameters))

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "format(\"iceberg\") requires option(\"path\", <table dir>)"))
    val snapshot = parameters.get("snapshotId").map(_.toLong)
    // option("timestampAsOf", <epoch millis | ISO-8601 | 'yyyy-MM-dd
    // HH:mm:ss' UTC>): latest snapshot at-or-before the instant
    val timestampAsOf = parameters.get("timestampAsOf").map { s =>
      if (s.forall(_.isDigit)) s.toLong
      else scala.util.Try(java.time.Instant.parse(s).toEpochMilli)
        .orElse(scala.util.Try(java.time.LocalDateTime
          .parse(s.replace(' ', 'T'))
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli))
        .getOrElse(throw new IllegalArgumentException(
          s"timestampAsOf '$s' — use epoch millis, ISO-8601, or " +
            "'yyyy-MM-dd HH:mm:ss' (UTC)"))
    }
    // option("filter", <sql predicate>): applied as a row filter AND
    // pushed to the manifest level as identity-partition pruning — on
    // a partitioned foreign tree the scan never opens non-matching
    // partitions' files
    val filter = parameters.get("filter")
    CdcRelation(sqlContext,
      IcebergInterop.readIceberg(sqlContext.sparkSession, path,
        snapshot, filter, timestampAsOf))
  }
}

/** Collision-proof alias for [[DeltaTableSource]] — resolves even when
  * a real delta-spark jar also registers `delta`.
  */
class GraftDeltaTableSource extends DeltaTableSource {
  override def shortName(): String = "graft-delta"
}

/** Collision-proof alias for [[IcebergTableSource]] — resolves even
  * when a real iceberg-runtime jar also registers `iceberg`.
  */
class GraftIcebergTableSource extends IcebergTableSource {
  override def shortName(): String = "graft-iceberg"
}

/** The V1 streaming source over a foreign Delta log: offsets are log
  * versions. `getBatch(None, v)` serves the live snapshot as of `v`
  * (the batch reader, so checkpoints/partitions/DVs all apply);
  * `getBatch(Some(s), e)` serves exactly the adds of versions
  * (s, e] ([[DeltaInterop.tailAdds]] — refuses non-append tails
  * loudly). Frames re-brand streaming via the engine's
  * `internalCreateDataFrame` (reached reflectively — `private[sql]`
  * is public in bytecode; the same pragmatic seam as the CDC
  * changelog source).
  */
private[sources] class DeltaStreamSource(
    spark: org.apache.spark.sql.SparkSession, table: String)
    extends org.apache.spark.sql.execution.streaming.Source {

  import org.apache.spark.sql.execution.streaming.{Offset => V1Offset}
  import org.apache.spark.sql.execution.streaming.runtime.LongOffset

  private val streamSchema = DeltaInterop.streamSchema(spark, table)

  override def schema: StructType = streamSchema

  override def getOffset: Option[V1Offset] =
    DeltaInterop.headVersion(spark, table).map(LongOffset(_))

  private def idOf(o: V1Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  override def getBatch(start: Option[V1Offset],
      end: V1Offset): org.apache.spark.sql.DataFrame = {
    val hi = idOf(end)
    val df = start.map(idOf) match {
      case None => DeltaInterop.snapshotBatch(spark, table, hi)
      case Some(lo) if lo >= hi =>
        DeltaInterop.tailAdds(spark, table, streamSchema, hi, hi)
      case Some(lo) =>
        DeltaInterop.tailAdds(spark, table, streamSchema, lo, hi)
    }
    val rdd = df.queryExecution.toRdd
    val m = spark.getClass.getMethod("internalCreateDataFrame",
      classOf[org.apache.spark.rdd.RDD[_]], classOf[StructType],
      java.lang.Boolean.TYPE)
    m.invoke(spark, rdd, streamSchema, java.lang.Boolean.TRUE)
      .asInstanceOf[org.apache.spark.sql.DataFrame]
  }

  override def stop(): Unit = ()

  override def toString: String = s"DeltaStreamSource[$table]"
}

/** The V1 streaming source over an Iceberg tree: offsets are METADATA
  * versions (each commit writes a new metadata file). `getBatch(None,
  * v)` serves the snapshot current at metadata `v` through the full
  * batch reader; `getBatch(Some(s), e)` serves exactly the data files
  * added between the two ([[IcebergInterop.tailAdds]] — refuses
  * non-append tails loudly). Same reflective streaming re-brand as
  * the Delta source.
  */
private[sources] class IcebergStreamSource(
    spark: org.apache.spark.sql.SparkSession, table: String)
    extends org.apache.spark.sql.execution.streaming.Source {

  import org.apache.spark.sql.execution.streaming.{Offset => V1Offset}
  import org.apache.spark.sql.execution.streaming.runtime.LongOffset

  private val declared = IcebergInterop.streamSchema(spark, table)

  override def schema: StructType = declared

  override def getOffset: Option[V1Offset] =
    IcebergInterop.versions(spark, table).lastOption.map(LongOffset(_))

  private def idOf(o: V1Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  override def getBatch(start: Option[V1Offset],
      end: V1Offset): org.apache.spark.sql.DataFrame = {
    val hi = idOf(end)
    val df = start.map(idOf) match {
      case None =>
        val snap = IcebergInterop
          .streamState(spark, table, hi)._1
        IcebergInterop.readIceberg(spark, table, Some(snap))
      case Some(lo) if lo >= hi =>
        IcebergInterop.tailAdds(spark, table, declared, hi, hi)
      case Some(lo) =>
        IcebergInterop.tailAdds(spark, table, declared, lo, hi)
    }
    val rdd = df.queryExecution.toRdd
    val m = spark.getClass.getMethod("internalCreateDataFrame",
      classOf[org.apache.spark.rdd.RDD[_]], classOf[StructType],
      java.lang.Boolean.TYPE)
    m.invoke(spark, rdd, declared, java.lang.Boolean.TRUE)
      .asInstanceOf[org.apache.spark.sql.DataFrame]
  }

  override def stop(): Unit = ()

  override def toString: String = s"IcebergStreamSource[$table]"
}
