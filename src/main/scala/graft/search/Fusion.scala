package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Rank fusion for hybrid retrieval — combining a keyword run
  * ([[Bm25]]) with an embedding run ([[graft.ann.Ann]]) into one
  * ranking, the standard first stage of a RAG / retrieval-curation
  * pipeline. Reciprocal Rank Fusion (Cormack, Clarke & Büttcher,
  * SIGIR 2009): fused(d) = Σ_runs 1 / (k + rank_run(d)), with a run
  * that did not retrieve `d` contributing 0.
  *
  * Determinism contract (the property that makes hybrid search
  * oracle-checkable): ranks are dense integers assigned by each run's
  * total order (score desc, id asc — ties broken by id), each
  * reciprocal is ONE IEEE double division of exact integers, and the
  * fused sum adds the runs in the caller's fixed left-to-right order —
  * bit-identical in any engine, where averaging raw scores of
  * different scales would not even be well-defined.
  *
  * Scale: each run is already a top-k (tiny); ranking them is a
  * window over ≤ k rows and the fusion is a k-row outer join — the
  * expensive work happened inside the runs (which prune via their
  * indexes), never here.
  */
object Fusion {

  /** Rank one run: `(id, rank)` with rank 1 = best, dense, total
    * (ties on `scoreCol` break by id ascending).
    */
  private def ranked(run: DataFrame, idCol: String, scoreCol: String,
      tag: String): DataFrame =
    run.select(col(idCol).as("id"),
      row_number().over(
        Window.orderBy(col(scoreCol).desc, col(idCol).asc))
        .cast(LongType).as(s"rank_$tag"))

  /** Fuse named runs by RRF. `runs` is (tag, frame, scoreCol) — each
    * frame one retrieval run carrying `idCol` and its score column.
    * Returns one row per id retrieved by ANY run: the per-run ranks
    * (NULL where not retrieved) and `rrf_score`, ordered best-first
    * with id tiebreak. `k` is the standard RRF damping constant
    * (60 in the paper).
    */
  def rrf(runs: Seq[(String, DataFrame, String)], idCol: String,
      k: Int = 60): DataFrame = {
    require(runs.nonEmpty, "at least one run is required")
    require(runs.map(_._1).distinct.size == runs.size,
      "run tags must be distinct")
    val rankedRuns = runs.map { case (tag, df, scoreCol) =>
      ranked(df, idCol, scoreCol, tag)
    }
    val joined = rankedRuns.reduceLeft((a, b) =>
      a.join(b, Seq("id"), "full_outer"))
    val score = runs.map { case (tag, _, _) =>
      when(col(s"rank_$tag").isNotNull,
        lit(1.0) / (lit(k.toDouble) + col(s"rank_$tag")
          .cast("double"))).otherwise(lit(0.0))
    }.reduceLeft(_ + _)
    joined
      .select((col("id").as(idCol) +:
        runs.map { case (tag, _, _) => col(s"rank_$tag") }) :+
        score.as("rrf_score"): _*)
      .orderBy(col("rrf_score").desc, col(idCol))
  }
}
