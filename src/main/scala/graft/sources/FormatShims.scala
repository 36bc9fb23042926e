package graft.sources

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister,
  RelationProvider}

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
class DeltaTableSource extends RelationProvider with DataSourceRegister {

  override def shortName(): String = "delta"

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
    with DataSourceRegister {

  override def shortName(): String = "iceberg"

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "format(\"iceberg\") requires option(\"path\", <table dir>)"))
    val snapshot = parameters.get("snapshotId").map(_.toLong)
    // option("filter", <sql predicate>): applied as a row filter AND
    // pushed to the manifest level as identity-partition pruning — on
    // a partitioned foreign tree the scan never opens non-matching
    // partitions' files
    val filter = parameters.get("filter")
    CdcRelation(sqlContext,
      IcebergInterop.readIceberg(sqlContext.sparkSession, path,
        snapshot, filter))
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
