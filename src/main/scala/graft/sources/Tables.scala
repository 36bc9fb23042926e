package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Loaders for the driver testdata (`/root/testdata/sf*`, TESTDATA.md).
  *
  * One parquet file per table; Spark's vectorized parquet reader gives
  * columnar scans with predicate pushdown + column pruning for free — the
  * Spark analog of the reference's Glue external table over parquet
  * (reference `main.tf:303-372`).
  */
object Tables {

  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark's vectorized
    * reader only accepts as a raw long (`spark.sql.legacy.parquet.
    * nanosAsLong=true`, set by Verify/Bench). Convert to a naive
    * microsecond timestamp here — integer DIV, not double division, since
    * epoch-nanos exceed 2^53.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts",
        expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)"))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Date-partitioned materialization of `events` — the 100 TB layout:
    * big fact tables are written partitioned on event date so date-ranged
    * queries prune whole partitions at planning time instead of scanning
    * and filtering (`.explain` shows the pruned `PartitionFilters`).
    * Written once per source dataset (idempotent; the cache path embeds
    * an input fingerprint, so a regenerated source never serves stale
    * partitions — see [[Artifacts]]).
    */
  def eventsByDate(s: SparkSession, d: String): DataFrame = synchronized {
    val path = new java.io.File("target/graft-data/events_by_date/" +
      Artifacts.datasetKey(d, s"$d/events.parquet"))
    if (!new java.io.File(path, "_SUCCESS").exists()) {
      events(s, d)
        .withColumn("event_date", org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.col("ts")))
        .write.mode("overwrite").partitionBy("event_date")
        .parquet(path.getAbsolutePath)
    }
    s.read.parquet(path.getAbsolutePath)
  }

  /** List-partitioned materialization of `embeddings` — the IVF storage
    * layout at 100 TB: vectors land in one directory per inverted-list id
    * (`label=<list>/`), so an IVF probe's `isin` over the `nprobe`
    * selected lists prunes whole partitions at planning time
    * (`PartitionFilters` in `.explain`) and the probe scans ~nprobe/nlists
    * of the data instead of filtering a full scan. Same idempotent
    * fingerprint-keyed write as [[eventsByDate]]; one-time index build,
    * not per-query work.
    */
  def embeddingsByList(s: SparkSession, d: String): DataFrame = synchronized {
    val path = new java.io.File("target/graft-data/embeddings_by_list/" +
      Artifacts.datasetKey(d, s"$d/embeddings.parquet"))
    if (!new java.io.File(path, "_SUCCESS").exists()) {
      embeddings(s, d)
        .write.mode("overwrite").partitionBy("label")
        .parquet(path.getAbsolutePath)
    }
    s.read.parquet(path.getAbsolutePath)
  }

  /** Register every testdata table as a temp view, so `spark.sql` text
    * matches the oracle SQL one-for-one.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
