package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types._

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

  /** Declared schemas, asserted on every read (SURVEY §1.1: an explicit
    * `StructType` checked at the source, never trusted to inference —
    * the Spark analog of the reference's declared Glue table schema,
    * `main.tf:330-371`). Parquet self-describes, so a corrupted or
    * silently-evolved file would otherwise drift into queries unnoticed;
    * here it fails loudly at the read. Timestamp-kind fields accept both
    * NTZ and local-timestamp logical types (a session-config difference,
    * not data drift); `events.ts` additionally accepts raw BIGINT — the
    * file is TIMESTAMP(NANOS), surfaced as a long under
    * `spark.sql.legacy.parquet.nanosAsLong` and converted by [[events]].
    */
  val schemas: Map[String, StructType] = Map(
    "region" -> StructType(Seq(
      StructField("r_regionkey", IntegerType),
      StructField("r_name", StringType))),
    "nation" -> StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType))),
    "customer" -> StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType))),
    "supplier" -> StructType(Seq(
      StructField("s_suppkey", LongType),
      StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType),
      StructField("s_acctbal", DoubleType))),
    "part" -> StructType(Seq(
      StructField("p_partkey", LongType),
      StructField("p_name", StringType),
      StructField("p_brand", StringType),
      StructField("p_type", StringType),
      StructField("p_size", IntegerType),
      StructField("p_retailprice", DoubleType))),
    "orders" -> StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampNTZType),
      StructField("o_orderpriority", StringType))),
    "lineitem" -> StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType),
      StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType),
      StructField("l_tax", DoubleType),
      StructField("l_returnflag", StringType),
      StructField("l_linestatus", StringType),
      StructField("l_shipdate", TimestampNTZType))),
    "events" -> StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType))),
    "documents" -> StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType))),
    "embeddings" -> StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType))))

  /** Timestamp-kind logical types interchange per session config;
    * `events.ts` may also surface as raw nanos (BIGINT).
    */
  private def typeCompatible(table: String, field: String,
      expected: DataType, actual: DataType): Boolean =
    expected == actual ||
      (expected == TimestampNTZType && actual == TimestampType) ||
      (table == "events" && field == "ts" &&
        (actual == TimestampNTZType || actual == TimestampType))

  def assertSchema(table: String, actual: StructType): Unit =
    schemas.get(table).foreach { expected =>
      val mismatch =
        actual.fields.length != expected.fields.length ||
          expected.fields.zip(actual.fields).exists { case (e, a) =>
            e.name != a.name || !typeCompatible(table, e.name,
              e.dataType, a.dataType)
          }
      require(!mismatch,
        s"schema drift on table '$table': expected " +
          s"${expected.simpleString}, found ${actual.simpleString}")
    }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    assertSchema(name, df.schema)
    df
  }

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
    Artifacts.commitOnce(s, path.getAbsolutePath)(tmp =>
      events(s, d)
        .withColumn("event_date", org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.col("ts")))
        .write.mode("overwrite").partitionBy("event_date")
        .parquet(tmp))
    s.read.parquet(path.getAbsolutePath)
  }

  /** Small derived date dimension over the fact table's date domain —
    * the star-schema companion to [[eventsByDate]]. Its attribute columns
    * (`dom`, `dom_mod`, `week_of_month`) are STORED data, not expressions
    * over `d` in the query plan: a filter on them cannot be rewritten into
    * a static predicate on the fact's partition column, which is exactly
    * the situation where Catalyst's DYNAMIC partition pruning must carry
    * the dimension's surviving keys to the fact scan at runtime
    * (`DynamicPruningExpression` in the scan's PartitionFilters) — the
    * 100 TB mechanism the reference's Glue layer cannot express at all
    * (reference `main.tf:313` disables even static partition projection).
    * Same idempotent fingerprint-keyed build as [[eventsByDate]].
    */
  def dateDim(s: SparkSession, d: String): DataFrame = synchronized {
    import org.apache.spark.sql.functions.{col, dayofmonth, to_date}
    // _v2: week_of_month became a true integer ordinal — the dataset
    // fingerprint keys on the INPUT data only, so a formula change must
    // bump the path or stale cached artifacts would be read back
    val path = new java.io.File("target/graft-data/date_dim_v2/" +
      Artifacts.datasetKey(d, s"$d/events.parquet"))
    Artifacts.commitOnce(s, path.getAbsolutePath)(tmp =>
      events(s, d)
        .select(to_date(col("ts")).as("d"))
        .distinct()
        .select(col("d"),
          dayofmonth(col("d")).as("dom"),
          (dayofmonth(col("d")) % 7).as("dom_mod"),
          // integer week ordinal (1..5); Column `/` is true division and
          // would store 3.14-style doubles under an ordinal-named column
          (((dayofmonth(col("d")) - 1) / 7).cast("int") + 1)
            .as("week_of_month"))
        .coalesce(1)
        .write.mode("overwrite").parquet(tmp))
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
    Artifacts.commitOnce(s, path.getAbsolutePath)(tmp =>
      embeddings(s, d)
        .write.mode("overwrite").partitionBy("label")
        .parquet(tmp))
    s.read.parquet(path.getAbsolutePath)
  }

  /** Scale-adaptive scan spread (optimization guide §2.5: "one huge
    * unsplittable file … repartition immediately after the read").
    *
    * Spark sizes scan parallelism by BYTES, which under-parallelizes
    * compute-dense work (codecs, hashing, shingling: ~10³ CPU ops per
    * input byte) whenever the source's file layout yields fewer splits
    * than cores — the degenerate case being a single-row-group parquet
    * file, whose scan is ONE task no matter what the split configs say.
    * This helper round-robins such a scan across the session's default
    * parallelism so the map-side work that follows runs on every core.
    *
    * The decision is derived from the INPUT (planned scan partitions vs
    * default parallelism), not from a constant: at production scale a
    * 100 TB table has orders of magnitude more file splits than cores,
    * the gate never fires, and the plan is byte-identical to the
    * un-spread one — so no query ever pays a payload-wide shuffle where
    * the layout already parallelizes. `spark.graft.scan.spread=false`
    * disables it outright.
    *
    * Apply only to NARROW frames (scan + filter/project): the partition
    * probe plans the frame, and a frame carrying exchanges would
    * (a) misreport and (b) under AQE eagerly materialize stages.
    * Results are partitioning-independent for every caller by contract
    * (exact aggregates, sorted collects, total-order outputs — the same
    * determinism the hash oracle already enforces across engines).
    */
  def spread(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val enabled = df.sparkSession.conf
      .get("spark.graft.scan.spread", "true").toBoolean
    val target = sc.defaultParallelism
    if (!enabled) df
    else if (df.rdd.getNumPartitions * 2 <= target) df.repartition(target)
    else df
  }

  /** Register every testdata table as a temp view, so `spark.sql` text
    * matches the oracle SQL one-for-one.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
