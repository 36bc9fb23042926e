package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: documents are laid out in a
  * deterministic order, conceptually concatenated into one token
  * stream, and the stream is cut into fixed `budget`-token context
  * windows — each document is assigned the window (bin) its first token
  * falls in. This is the standard pack-then-cut pass that turns a
  * shuffled corpus into fixed-length pretraining sequences.
  *
  * The global running token total is a distributed PREFIX SUM, not a
  * single-partition window (`Window.orderBy` with no partition key
  * funnels 100 TB through one task): rows are range-partitioned and
  * sorted on the order key, each partition computes a local running
  * total, the per-partition grand totals — one row per partition,
  * manifest-sized — are offset-summed on a single tiny partition, and
  * the offsets broadcast back. Two data shuffles total (the range
  * exchange, and the window's hash exchange on partition id), both
  * scale-out; nothing global ever materializes.
  */
object Packing {

  /** Each input row plus `_start` (tokens preceding it in the stream)
    * and `bin_id` (= `_start / budget`, the context window its first
    * token lands in). `orderCols` must be a TOTAL order (break ties with
    * a unique id) or the packing is nondeterministic. `_tok` carries the
    * evaluated token count so callers aggregate without recomputing.
    *
    * The running total and the per-partition offsets both consume the
    * prepared rows, and Spark does not reuse that stage across the
    * offsets' broadcast boundary (measured: two source scans, two
    * tokenize passes). `stagingDir` removes the recompute at scale:
    * the prepared rows are written there ONCE, the offsets pass then
    * reads a column-pruned (`_pid`, `_tok`) projection of the staged
    * parquet instead of re-running scan + tokenize + range exchange —
    * the same one-time-materialization idiom as the dedup signature
    * index. A staging dir that already holds a committed write (a
    * `_SUCCESS` marker) is TRUSTED and reused without re-scanning the
    * source at all. Invalidation is shared: the caller keys the path on
    * an input fingerprint (`Artifacts.datasetKey`) for the DATA, and
    * packBins itself suffixes the path with a hash of the preparation
    * RECIPE (the input's canonicalized plan — filters included — the
    * order columns, the token expression, and the partition count), so
    * a query-code change with unchanged source data rebuilds the stage
    * instead of silently reusing stale rows. The budget is deliberately
    * NOT in the key — staged rows are budget-independent, so re-cutting
    * the same corpus at a new context length reuses the stage. The
    * staged write commits via write-to-temp + atomic directory rename:
    * a dir either exists complete (with `_SUCCESS`) or not at all, two
    * racing writers resolve to one winner (the loser discards its temp
    * and reads the winner's commit), and a reader can never observe a
    * half-written stage. Leave it None for small inputs where a second
    * pass is cheaper than a full write.
    */
  def packBins(docs: DataFrame, orderCols: Seq[Column], tokens: Column,
      budget: Long, partitions: Option[Int] = None,
      stagingDir: Option[String] = None): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    val reserved = Seq("_tok", "_pid", "_start", "_ptotal", "_offset",
      "bin_id").filter(docs.columns.contains)
    require(reserved.isEmpty,
      s"reserved column names in use: ${reserved.mkString(",")}")
    def prepared = {
      val withTok = docs.withColumn("_tok", tokens.cast("long"))
      // explicit count pins the range exchange (AQE coalesces the
      // default — right in production, wrong when a test must prove
      // boundaries)
      partitions
        .fold(withTok.repartitionByRange(orderCols: _*))(n =>
          withTok.repartitionByRange(n, orderCols: _*))
        .withColumn("_pid", spark_partition_id())
    }
    // once staged, `_pid` is an ordinary stored column — the window's
    // hash exchange on it below re-establishes co-location, so losing
    // the physical range partitioning in the round trip is harmless
    val base = stagingDir.fold(prepared) { dir0 =>
      // recipe hash: canonicalized plan normalizes expression ids, so
      // the key is stable across sessions for the same source + params.
      // Two hardenings: (a) the full schema JSON rides along, because
      // plan toString TRUNCATES wide field lists ("... 10 more fields")
      // — without it, two preparations differing only in truncated
      // fields would share a key and silently reuse a stale stage;
      // (b) lambda variables (higher-order functions) print with a
      // session-global counter suffix (`x_37 ->`, `y_38` on two-arg
      // lambdas) that depends on how many lambdas the JVM created
      // before this call — normalize them or every session re-stages.
      // A REAL column named like a lambda variable stays disambiguated
      // by its un-normalized appearance in the schema JSON.
      val normalized =
        (docs.queryExecution.logical.canonicalized.toString +
          "|" + orderCols.mkString(",") +
          "|" + tokens.toString + "|" + partitions.getOrElse(-1))
          .replaceAll("\\b[xyz]_\\d+\\b", "v_")
      // schema json OUTSIDE the normalization, so a real x_1 column
      // stays distinguishable there
      val recipe = docs.schema.json + "|" + normalized
      // SHA-256 truncated to 64 bits: a 32-bit hash makes a silent
      // stale-stage reuse merely unlikely; 64 bits of a cryptographic
      // digest makes it implausible (collision = wrong cached data)
      val dir = s"$dir0-${
        java.security.MessageDigest.getInstance("SHA-256")
          .digest(recipe.getBytes(
            java.nio.charset.StandardCharsets.UTF_8))
          .take(8).map(b => f"$b%02x").mkString}"
      graft.sources.Artifacts.commitOnce(docs.sparkSession, dir)(tmp =>
        prepared.write.mode("overwrite").parquet(tmp))
      docs.sparkSession.read.parquet(dir)
    }
    // local running total, EXCLUSIVE of the current row (a document
    // starts at the boundary its predecessors reached)
    val local = base.withColumn("_start",
      coalesce(
        sum(col("_tok")).over(Window.partitionBy(col("_pid"))
          .orderBy(orderCols: _*)
          .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    // one row per partition: safe to window on a single task
    val offsets = local.groupBy(col("_pid"))
      .agg(sum(col("_tok")).as("_ptotal"))
      .withColumn("_offset",
        coalesce(
          sum(col("_ptotal")).over(Window.orderBy(col("_pid"))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("_pid"), col("_offset"))
    local.join(broadcast(offsets), "_pid")
      .withColumn("_start", col("_start") + col("_offset"))
      .withColumn("bin_id", floor(col("_start") / lit(budget)))
      .drop("_pid", "_offset")
  }
}
