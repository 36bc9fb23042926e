package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-wins snapshot merge — the MERGE/upsert primitive of a lake
  * that has no transactional table format available (the reference's
  * governed tables get this from Lake Formation; Delta/Iceberg jars are
  * not in this environment, so the operator is expressed as pure
  * dataflow over plain parquet snapshots).
  *
  * Semantics: rows carry a per-key monotonically increasing version
  * (ingest batch id, CDC LSN, event time); the merged snapshot keeps,
  * per key, exactly the row with the highest version. Rows whose
  * `deletedCol` (optional) is true act as tombstones: winning deletes
  * remove the key from the snapshot entirely.
  *
  * Scale shape: ONE shuffle on the key (the ranking window), no join —
  * base ∪ updates is a union (zero-cost plan node), and the window's
  * per-key sort spills for skewed keys. Equivalent join formulations
  * (anti-join base + union) shuffle both sides twice. Determinism:
  * callers must ensure (key, version) is unique — equal versions for
  * one key would make "the" latest row ambiguous in any engine, so the
  * operator fails loudly rather than pick one.
  */
object Upsert {

  /** Merge `base` and `updates` (same schema plus `versionCol`) into the
    * latest-wins snapshot. `deletedCol`, when present, tombstones keys.
    */
  def latestWins(base: DataFrame, updates: DataFrame, keys: Seq[String],
      versionCol: String, deletedCol: Option[String] = None): DataFrame = {
    val reserved = Seq("_rn", "_ties")
      .filter(r => base.columns.contains(r) || updates.columns.contains(r))
    require(reserved.isEmpty,
      s"reserved column names in use: ${reserved.mkString(",")}")
    val all = base.unionByName(updates)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc)
    // ties are only fatal when they involve the WINNING version of a key
    // (an ambiguous old version is harmlessly superseded), so the guard
    // rides a filter on the rn=1 rows — a filter predicate is always
    // evaluated, where a projected-then-dropped check column would be
    // pruned away unevaluated
    val latest = all
      .withColumn("_rn", row_number().over(w))
      .withColumn("_ties", count(lit(1)).over(
        Window.partitionBy((keys :+ versionCol).map(col): _*)))
      .filter(col("_rn") === 1)
      .filter(when(col("_ties") > 1, raise_error(concat(
          lit(s"ambiguous merge: duplicate $versionCol for key "),
          concat_ws(",", keys.map(col): _*))).cast("boolean"))
        .otherwise(lit(true)))
      .drop("_rn", "_ties")
    deletedCol.fold(latest)(c => latest.filter(!coalesce(col(c),
      lit(false))).drop(c))
  }

  /** Column helper: `true` when this row survives a merge — exposed for
    * callers that want the audit view (who was superseded) instead of
    * the merged snapshot.
    */
  def isLatest(keys: Seq[String], versionCol: String): Column =
    row_number().over(Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc)) === 1
}
