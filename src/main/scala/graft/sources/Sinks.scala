package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Result sinks. The reference's query results land as one CSV object per
  * query under `s3://.../athena-results/` (reference `main.tf:504-510`,
  * `scripts/validate.sh:160-163`); [[writeCsv]] mirrors that contract.
  */
object Sinks {

  /** Write a RESULT SET (post-aggregation, small by construction — the
    * analog of an Athena result object) as a single headered CSV file
    * directory. The `coalesce(1)` is deliberate and safe here precisely
    * because this sink is for query results, not datasets; bulk data
    * export at 100 TB would drop the coalesce and write one part per
    * partition.
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(path)

  /** Read a headered CSV with an explicit schema (CSV carries no types, so
    * round-trips must re-assert them — same reason Athena DDL declares
    * column types over the raw objects).
    */
  def readCsv(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** Write JSON Lines — the de-facto interchange format of training-data
    * pipelines (one JSON object per line, splittable, appendable). For
    * DATASET export this keeps one part per partition (unlike the
    * result-set CSV sink): JSONL's whole point at 100 TB is parallel
    * write and parallel re-read.
    */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Read JSONL with an explicit schema — never inferred: inference
    * scans the data once just to guess types, and a missing field in the
    * first files silently drops the column for the whole read. With a
    * declared schema, absent fields are NULL and extra fields are
    * ignored, per JSONL convention.
    */
  def readJsonl(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Streaming twin of [[readJsonl]]: tail a landing directory of JSONL
    * files — the front door of a continuous training-data ingest
    * pipeline (files land from crawlers/exports; the stream picks each
    * one up exactly once, tracked by the query's checkpoint).
    * `maxFilesPerTrigger` bounds per-micro-batch work so a backlog of
    * thousands of landed files drains in controlled increments instead
    * of one giant batch. Schema is declared for the same reason as the
    * batch reader — inference is impossible on a stream anyway.
    * Compose with [[graft.dedup.Dedup.exactStreaming]] for
    * dedup-on-ingest (see SinksAndSourcesSpec for the end-to-end form).
    */
  def readJsonlStream(spark: SparkSession, path: String,
      schema: StructType, maxFilesPerTrigger: Int = 64): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(path)

  /** ORC dataset sink — the second columnar lake format (built into
    * Spark; the reference's Glue catalog serves ORC tables through the
    * same DDL as parquet). Same vectorized-scan properties as parquet:
    * predicate pushdown and column pruning (asserted in
    * SinksAndSourcesSpec), one part per partition.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Read ORC with a DECLARED schema, same contract as [[readJsonl]] /
    * the parquet table reads: never trust a lake file's self-description
    * to match what the pipeline expects.
    */
  def readOrc(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Small-file compaction — the lake-maintenance pass every streaming
    * ingest needs: a landing directory accumulates one file per
    * micro-batch partition, and a 100 TB table read through thousands of
    * KB-sized files is dominated by per-file open/footer cost. Rewrites
    * the directory into `ceil(bytes / targetBytes)` files (size-derived,
    * never a fixed count — a fixed count under-splits big inputs and
    * over-splits small ones). Writes to a NEW directory: object stores
    * have no atomic directory swap, so the safe pattern is
    * write-new + repoint-readers + delete-old; compacting in place
    * would window readers against missing files.
    */
  def compactParquet(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long = 128L << 20): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(p).getLength
    val parts = math.max(1L,
      (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inPath)
      .repartition(parts)
      .write.mode("overwrite").parquet(outPath)
    spark.read.parquet(outPath)
  }
}
