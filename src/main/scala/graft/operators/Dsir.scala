package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * NeurIPS: select pretraining data distributed like a TARGET domain
  * by resampling the raw pool under importance weights
  * w(x) = p_target(x) / q_raw(x), both densities estimated with cheap
  * hashed n-gram models). The widely-used LLM-curation move for
  * "give me web data that looks like Wikipedia/books/code".
  *
  * This engine's formulation keeps every stage oracle-checkable:
  *
  *  - both densities are [[NgramLm]]'s Laplace-smoothed POOLED bigram
  *    estimators — exact-integer sufficient statistics (Σ(c12+1),
  *    Σ(c1+V)) per document under each model;
  *  - the importance weight is the RATIO of the two pooled
  *    probability estimates, (t_num/t_den) / (r_num/r_den), evaluated
  *    as (double(t_num) · double(r_den)) / (double(t_den) ·
  *    double(r_num)) — four exact long→double casts and three
  *    correctly-rounded IEEE ops in a fixed order, so DuckDB
  *    reproduces the weight bit-for-bit (the textbook form
  *    exponentiates a log-likelihood-ratio sum — libm, unhashable;
  *    the ratio of pooled estimates is the same monotone signal);
  *  - selection is [[Sampling.prioritySample]] over the weight:
  *    weight-proportional inclusion WITHOUT replacement. DSIR's
  *    Gumbel-top-k and priority sampling are both
  *    weight-proportional-without-replacement schemes; priority
  *    sampling keeps the engine's id-derived determinism contract
  *    (reproducible, engine-neutral — a Gumbel draw is neither).
  *
  * Scale: two NgramLm scorings — each two explode → two-phase hash
  * aggregates whose counts shuffle as (term, long), never text, plus
  * one term-keyed join — then ONE primary-key join of the two
  * four-long score rows (O(docs), AQE-broadcast while either side
  * fits), a map-side weight projection, and a TakeOrdered top-k.
  * Nothing collects; no step is quadratic. Reference analog: the
  * delegated engine class (`outputs.tf:57-97`) would run this as two
  * CTEs + a join; the curated-zone story is the same as `q_lm_score`.
  */
object Dsir {

  /** Per-document importance weights under a target-domain bigram LM
    * vs a raw-pool bigram LM. Output: idCol, keep..., t_num, t_den,
    * r_num, r_den (the exact pooled sufficient statistics under each
    * model), weight (> 0 always — smoothing keeps every sum >= 1).
    */
  def weights(docs: DataFrame, idCol: String, textCol: String,
      target: DataFrame, raw: DataFrame,
      keep: Seq[String] = Nil): DataFrame = {
    val t = NgramLm.score(docs, idCol, textCol, target, keep)
      .select((col(idCol) +: keep.map(col)) :+
        col("sum_num").as("t_num") :+ col("sum_den").as("t_den"): _*)
    val r = NgramLm.score(docs, idCol, textCol, raw)
      .select(col(idCol), col("sum_num").as("r_num"),
        col("sum_den").as("r_den"))
    t.join(r, Seq(idCol))
      .withColumn("weight",
        (col("t_num").cast(DoubleType) * col("r_den").cast(DoubleType)) /
          (col("t_den").cast(DoubleType) * col("r_num").cast(DoubleType)))
  }

  /** Weight-proportional selection of `k` documents from a
    * [[weights]] frame — the resampling half of DSIR, inheriting
    * [[Sampling.prioritySample]]'s determinism and top-k plan shape
    * (per-partition heaps, never a global sort).
    */
  def resample(weighted: DataFrame, idCol: String, k: Int): DataFrame =
    Sampling.prioritySample(weighted, idCol, col("weight"), k)
}
