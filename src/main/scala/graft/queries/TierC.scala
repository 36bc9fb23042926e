package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.ann.Ann
import graft.dedup.Dedup
import graft.functions.{TextFunctions => T}
import graft.multimodal.{Multimodal => M}
import graft.operators.Profile
import graft.search.Bm25
import graft.sources.Tables

/** Tier C — the LLM-training-data-pipeline operators (BASELINE.json north
  * star): dedup (exact / MinHash / SimHash / n-gram Jaccard / embedding),
  * similarity search, text analysis, event-stream analytics.
  *
  * Oracle-expressible queries follow the same determinism rules as Tier B.
  * Only ops whose engine-specific hashing DuckDB cannot reproduce
  * (MinHash/SimHash/hyperplane LSH via xxhash64/splitmix64, HLL and
  * percentile sketches, the multimodal payload fingerprint) are declared
  * without `oracleSql` → rows-only check; their outputs are still fully
  * deterministic (fixed seeds, total orders), and each has an exact
  * oracle-checked twin where one exists. IVF, language-ID and the
  * thresholded n-gram-Jaccard/cluster pipeline ARE hash-checked: their
  * arithmetic is exact-integer (or integer-quantized), so DuckDB
  * reproduces them bit-for-bit.
  */
object TierC {

  type Q = (SparkSession, String) => DataFrame

  /** Deterministic shuffle key (public: OperatorPropSpec drives it
    * directly); forwarded from [[TierCHelpers.trainShuffleKey]].
    */
  def trainShuffleKey(id: Column): Column =
    TierCHelpers.trainShuffleKey(id)

  val queries: Map[String, Q] =
    TierCCdc.queries ++ TierCDedup.queries ++ TierCSearch.queries ++
      TierCText.queries ++ TierCPipeline.queries

  val oracles: Map[String, String] =
    TierCCdc.oracles ++ TierCDedup.oracles ++ TierCSearch.oracles ++
      TierCText.oracles ++ TierCPipeline.oracles
}
