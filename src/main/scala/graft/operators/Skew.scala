package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by salting — the manual counterpart to AQE's runtime
  * skew-join splitting, for when a handful of hot keys would otherwise
  * send most of the data to a few reducers.
  *
  * The salt is a per-ROW round-robin over the partition-local position,
  * not a hash of row content: a hot key's rows are typically IDENTICAL
  * (the canonical skew case), so any content-derived salt would map them
  * all to one value and spread nothing. The final aggregation / join
  * RESULT is independent of the salt assignment (counts/exact sums/
  * min/max merge associatively; the join replicates the right side to
  * every salt).
  *
  * Retry-stability contract: the salt is partition-position-derived, so
  * it is stable under task retry exactly when the input's partitioning
  * and row order are — true for deterministic source scans (parquet
  * files), NOT for a shuffle output whose row order can change on
  * recomputation. Apply these operators directly over source-scanned (or
  * materialized) frames; and use an exact (decimal/integer) value column
  * for sums, as the declared queries do, so partial-sum grouping cannot
  * affect the result either.
  */
object Skew {

  /** Salt column in [0, salts): round-robin by partition-local row
    * position — spreads identical rows uniformly.
    */
  private def saltOf(salts: Int): Column =
    pmod(monotonically_increasing_id(), lit(salts))

  /** Two-phase salted aggregation: groupBy (key, salt) fans a hot key out
    * over `salts` reducers for the heavy partial phase; the final combine
    * over `salts` sub-aggregates per key is tiny. Supports the mergeable
    * aggregates (count/sum/min/max) — the partial and final shapes are
    * (count→sum, sum→sum, min→min, max→max).
    */
  def saltedCountSum(df: DataFrame, keyCol: String, valueCol: String,
      salts: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt", saltOf(salts))
    salted
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_cnt"), sum(col(valueCol)).as("_sum"),
        min(col(valueCol)).as("_min"), max(col(valueCol)).as("_max"))
      .groupBy(col(keyCol))
      .agg(sum(col("_cnt")).as("cnt"), sum(col("_sum")).as("total"),
        min(col("_min")).as("min_v"), max(col("_max")).as("max_v"))
  }

  /** Salted equi-join for a skewed LEFT side: left rows get a
    * position-derived round-robin salt in [0, salts); the (small, hot)
    * right side is replicated `salts` times with an explicit salt column;
    * the join key becomes (key, salt), so one hot key spreads over
    * `salts` tasks instead of one. Right-side replication costs
    * |right| × salts rows — use only when right is small relative to the
    * skew it breaks.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    val saltedLeft = left.withColumn("_salt", saltOf(salts))
    val replicatedRight = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "_salt")).drop("_salt")
  }
}
