package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weight-proportional sampling without replacement — the corpus
  * curation move behind "sample 1M documents, favoring the long /
  * high-quality ones" (the reference's lake would run this as an
  * Athena ORDER BY over a derived priority; `outputs.tf:57-97`'s
  * delegated engine class).
  *
  * Scheme: PRIORITY SAMPLING (Duffield, Lund, Thorup, JACM 2007) —
  * each row draws a uniform u in (0,1) and takes priority u/w; the k
  * smallest priorities form the sample, which includes heavy rows
  * with probability proportional to their weight (and admits unbiased
  * subset-sum estimation via the (k+1)-th priority as threshold).
  *
  * Determinism: u derives from the row's OWN id by a Knuth
  * multiplicative hash taken mod 2^32 — exact integer arithmetic in
  * any engine — and both u (an x/2^32 power-of-two scaling) and u/w
  * are single correctly-rounded IEEE ops, so the sample is
  * reproducible bit-for-bit across engines and runs: the DuckDB
  * oracle recomputes the identical priorities. (A true PRNG draw
  * would be neither replayable nor oracle-checkable; id-derived
  * uniforms are this engine's standing convention — the same trade as
  * `q_train_shuffle`.)
  *
  * Scale: one map-side projection (two integer ops + one division per
  * row) and a TakeOrdered top-k — per-partition k-heaps merged on the
  * driver, never a global sort. Sampling 1M of 100 TB costs one scan.
  */
object Sampling {

  /** Deterministic uniform in (0, 1) from an integer id column:
    * (id * 2654435761 mod 2^32 + 0.5) / 2^32 — exact integer
    * arithmetic, then one exact power-of-two scaling. Never 0 (which
    * would make every weight tie at priority 0) and never 1.
    */
  def idUniform(id: Column): Column =
    (pmod(id * lit(2654435761L), lit(4294967296L)).cast("double") +
      lit(0.5)) / lit(4294967296.0)

  /** The k rows with smallest priority u/w — weight-proportional
    * inclusion. `weight` must be strictly positive; ties (identical
    * priorities) break by id for a total deterministic order. The
    * returned frame carries the priority so callers can derive the
    * Duffield threshold (the (k+1)-th priority) by asking for k+1.
    */
  def prioritySample(df: DataFrame, idCol: String, weight: Column,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val w = weight.cast("double")
    // enforce the strictly-positive contract IN the plan: a negative
    // weight would sort first (dominating the sample) and a zero weight
    // yields Inf/NaN priorities — both silent skew; fail loudly instead
    val checked = when(w > 0, w).otherwise(raise_error(concat(
      lit("prioritySample: weight must be strictly positive, got "),
      coalesce(w.cast("string"), lit("NULL")),
      lit(s" (row $idCol="), col(idCol).cast("string"), lit(")"))))
    df.withColumn("priority", idUniform(col(idCol)) / checked)
      .orderBy(col("priority"), col(idCol))
      .limit(k)
  }
}
