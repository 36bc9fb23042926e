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
    */
  def packBins(docs: DataFrame, orderCols: Seq[Column], tokens: Column,
      budget: Long, partitions: Option[Int] = None): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    val reserved = Seq("_tok", "_pid", "_start", "_ptotal", "_offset",
      "bin_id").filter(docs.columns.contains)
    require(reserved.isEmpty,
      s"reserved column names in use: ${reserved.mkString(",")}")
    val withTok = docs.withColumn("_tok", tokens.cast("long"))
    // explicit count pins the range exchange (AQE coalesces the default
    // — right in production, wrong when a test must prove boundaries)
    val base = partitions
      .fold(withTok.repartitionByRange(orderCols: _*))(n =>
        withTok.repartitionByRange(n, orderCols: _*))
      .withColumn("_pid", spark_partition_id())
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
