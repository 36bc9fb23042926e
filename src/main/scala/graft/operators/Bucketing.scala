package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-shuffled) table layout for co-located joins — the 100 TB
  * pattern for repeated fact-fact joins: both tables are written
  * hash-bucketed on the join key, so every subsequent join on that key is
  * a zero-shuffle sort-merge (each bucket pair joins locally; `.explain`
  * shows no `Exchange` under the join). One write amortizes across every
  * downstream join, which is exactly how warehouse fact tables are laid
  * out at scale.
  */
object Bucketing {

  /** Register `df` as a bucketed managed table (idempotent per session
    * catalog). Bucket count is a layout choice: at 100 TB you size buckets
    * to ~executor-core parallelism × a small factor; 8 keeps the local
    * test layout small.
    */
  def ensureBucketed(spark: SparkSession, df: => DataFrame, table: String,
      bucketCol: String, nBuckets: Int = 8): DataFrame = synchronized {
    if (!spark.catalog.tableExists(table)) {
      // the in-memory catalog forgets tables across JVMs but their
      // warehouse directories persist — clear a stale location first
      val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      val loc = new java.io.File(
        new java.net.URI(warehouse).getPath, table)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete()
        }
        rm(loc)
      }
      df.write.bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
        .format("parquet").saveAsTable(table)
    }
    spark.table(table)
  }
}
