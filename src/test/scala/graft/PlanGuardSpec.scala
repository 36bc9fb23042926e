package graft

import org.scalatest.funsuite.AnyFunSuite

/** Global plan guard: every declared query's physical plan is screened
  * for the two shapes that silently kill a 100 TB run — an unbounded
  * cartesian product, and a nested-loop join that isn't one of the
  * documented 1-row broadcast query-vector joins. Every future query
  * addition is screened automatically by being declared.
  */
class PlanGuardSpec extends AnyFunSuite with SparkTestBase {

  /** Queries whose plan legitimately contains BroadcastNestedLoopJoin:
    * a broadcast side of exactly ONE row (the ANN query vector / the
    * theta-range small build side) — constant work per stream row.
    */
  private val bnljAllowed = Set(
    "q_join_theta_range",  // non-equi range join, tiny broadcast side
    "q_embed_topk",        // 1-row query-vector crossJoin
    "q_ann_filtered",      // 1-row query-vector crossJoin
    "q_ann_ivf",           // 1-row query-vector crossJoin
    "q_ann_incremental",   // 1-row query-vector crossJoin
    "q_ann_kmeans",        // 1-row query-vector crossJoin
    "q_ann_pq",            // 1-row query-vector crossJoin (LUT build)
    "q_ann_ivfpq",         // 1-row query-vector crossJoins (probe + LUT)
    "q_mixture_temperature", // 1-row broadcast max-tokens aggregate
    "q_bm25_topk",         // 1-row corpus-stats crossJoin
    "q_bm25_incremental",  // 1-row corpus-stats crossJoin (rollup)
    "q_dsir_weights",      // two 1-row vocabulary-size crossJoins
                           // (one per bigram model, the q_lm_score V)
    "q_hybrid_search",     // inherits both runs' 1-row crossJoins
    "q_subquery_scalar",   // 1-row broadcast scalar-threshold aggregate
    "q_pmi_terms",         // 1-row broadcast corpus-total aggregate
    "q_lm_score",          // 1-row broadcast vocabulary-size aggregate
    "q_hard_negatives",    // bounded anchor-batch broadcast (k rows,
                           // a training batch — never the corpus);
                           // both appear only on a cold artifact cache
                           // (a warm run serves the persisted table)
    "q_lang_id_learned")   // |langs|-row (5) candidate-set crossJoin:
                           // every trained language is a candidate per
                           // doc — constant work per stream row

  /** Queries whose plan legitimately contains an UNPARTITIONED window:
    * the window's input is already metadata-sized (never the data).
    */
  private val globalWindowAllowed = Set(
    "q_pack_sequences",    // offsets window: one row per partition
    "q_hybrid_search")     // run ranking: window over <= k top-k rows

  test("no declared query runs an unpartitioned window over data") {
    import org.apache.spark.sql.execution.window.WindowExec
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) if !globalWindowAllowed(name) =>
        val plan =
          try fn(spark, sfDir).queryExecution.sparkPlan
          catch { case e: Throwable =>
            fail(s"$name failed to plan: ${e.getMessage}")
          }
        plan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty =>
            s"$name: single-partition window"
        }.headOption
      case _ => None
    }
    assert(offenders.isEmpty,
      s"every row funnels through ONE reducer in:\n" +
        offenders.mkString("\n"))
  }

  test("no declared query plans a cartesian product or a stray NL join") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan =
          try fn(spark, sfDir).queryExecution.sparkPlan.toString
          catch { case e: Throwable =>
            fail(s"$name failed to plan: ${e.getMessage}")
          }
        val cartesian =
          if (plan.contains("CartesianProduct")) Seq(s"$name: cartesian")
          else Seq.empty
        val bnlj =
          if (plan.contains("BroadcastNestedLoopJoin") &&
            !bnljAllowed(name)) Seq(s"$name: nested-loop join")
          else Seq.empty
        cartesian ++ bnlj
    }
    assert(offenders.isEmpty,
      s"scale-hostile plan shapes:\n${offenders.mkString("\n")}")
  }
}
