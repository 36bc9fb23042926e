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

  private val dec = DecimalType(18, 2)
  private def dsum(c: Column): Column = sum(c.cast(dec)).cast(DoubleType)

  /** Shared snapshot root for the declared CDC queries: a deterministic
    * two-batch change stream (full supplier insert load, then updates +
    * delete-wins) merged via [[graft.streaming.CdcApply]]. The root is
    * fingerprint-keyed on the input dataset (the
    * [[Tables.eventsByDate]] artifact pattern) and the change stream is
    * a pure function of the supplier table, so the snapshot is built
    * ONCE per input dataset — the replay guard (`CURRENT >= v<batchId>`)
    * turns every later invocation's re-applies into no-op manifest
    * reads.
    */
  /** Recipe/format version token folded into every CDC artifact root's
    * path — the repo-wide cache-key convention (Packing hashes its
    * preparation recipe, Dedup embeds every index parameter): a change
    * to the change-stream recipe in [[applySupplierCdc]] OR to
    * CdcApply's stored format must bump this, or the replay guard would
    * no-op the re-applies and every CDC query would silently read the
    * stale old snapshot. rev2 = the change-feed stamp column.
    */
  private val CdcRecipeRev = "rev2"

  /** Shared path construction + build for the supplier CDC roots: one
    * place to key them, so a keying change cannot silently diverge
    * across the six roots.
    */
  private def supplierCdcRoot(s: SparkSession, d: String,
      subdir: String, maxDeltas: Int = 0): String = {
    val root = new java.io.File(s"target/graft-data/$subdir/" +
      graft.sources.Artifacts.datasetKey(d, s"$d/supplier.parquet") +
      s"_$CdcRecipeRev").getAbsolutePath
    applySupplierCdc(s, d, root, maxDeltas)
    root
  }

  private def cdcQueryRoot(s: SparkSession, d: String): String =
    synchronized { supplierCdcRoot(s, d, "cdc_merge_q") }

  /** The two batches of the deterministic supplier change stream:
    * full insert load (batch 0), then updates + delete-wins (batch 1).
    * Exposed separately from [[applySupplierCdc]] so the rollup
    * artifact can INTERLEAVE them with its syncs (apply → sync →
    * apply → sync) and genuinely exercise the trickle path.
    */
  private def supplierCdcBatches(s: SparkSession, d: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val sup = Tables.supplier(s, d)
    val b0 = sup.withColumn("version", lit(1L))
      .withColumn("deleted", lit(false))
    val updates = sup.filter(col("s_suppkey") % 5 === 0)
      .withColumn("s_acctbal", col("s_acctbal") + lit(100.0))
      .withColumn("version", lit(2L))
      .withColumn("deleted", lit(false))
    val deletes = sup.filter(col("s_suppkey") % 7 === 0)
      .withColumn("version", lit(3L))
      .withColumn("deleted", lit(true))
    (b0, updates.unionByName(deletes))
  }

  /** Apply the deterministic supplier change stream behind every
    * declared CDC query. Shared so the governed / rebucketed snapshot
    * roots are provably the SAME logical table as `cdcQueryRoot` and
    * reuse the q_cdc_merge net-state oracle.
    */
  private def applySupplierCdc(s: SparkSession, d: String,
      root: String, maxDeltas: Int = 0): Unit = {
    import graft.streaming.CdcApply
    val (b0, b1) = supplierCdcBatches(s, d)
    // logical commit timestamps (1000, 2000) rather than wall clock:
    // q_cdc_asof resolves "as of t=1500" to batch 0 deterministically,
    // so the artifact's answer is a pure function of the input dataset
    CdcApply.applyBatch(b0, 0L, root, Seq("s_suppkey"), "version",
      Some("deleted"), commitTs = Some(1000L), maxDeltas = maxDeltas)
    CdcApply.applyBatch(b1, 1L, root,
      Seq("s_suppkey"), "version", Some("deleted"),
      commitTs = Some(2000L), maxDeltas = maxDeltas)
  }

  /** Snapshot root for `q_cdc_mor`: the same two-batch change stream
    * under the MERGE-ON-READ layout (`maxDeltas = 4`), so batch 1 lands
    * as pending delta directories and the declared read genuinely pays
    * the per-key latest-wins resolution across base + deltas. Its own
    * artifact dir: the copy-on-write roots must keep proving the
    * rewrite path.
    */
  private def cdcMorRoot(s: SparkSession, d: String): String =
    synchronized { supplierCdcRoot(s, d, "cdc_mor_q", maxDeltas = 4) }

  /** Snapshot root for `q_cdc_compact`: the merge-on-read stream of
    * [[cdcMorRoot]] in its own dir, then [[CdcApply.compactBuckets]]
    * folds every pending delta back into single bases. Idempotent:
    * replayed applies no-op on the guard and a re-compaction finds no
    * pending delta and returns false.
    */
  private def cdcCompactRoot(s: SparkSession, d: String): String =
    synchronized {
      val root = supplierCdcRoot(s, d, "cdc_compact_q", maxDeltas = 4)
      graft.streaming.CdcApply.compactBuckets(s, root)
      root
    }

  /** Snapshot root for `q_cdc_restore`: the two-batch stream applied,
    * then [[graft.streaming.CdcApply.restore]] rolls the table back to
    * batch 0 as a NEW commit (head 1 → 2) — reverted updates,
    * resurrected deletes, monotone watermark. Idempotent: replayed
    * applies no-op on the guard, and a repeat restore finds the state
    * already equal to the target and commits nothing.
    */
  private def cdcRestoreRoot(s: SparkSession, d: String): String =
    synchronized {
      val root = supplierCdcRoot(s, d, "cdc_restore_q")
      graft.streaming.CdcApply.restore(s, root, 0L,
        commitTs = Some(3000L))
      root
    }

  /** Snapshot root for `q_cdc_delete`: the two-batch stream applied,
    * then [[graft.streaming.CdcApply.deleteWhere]] tombstones every
    * `s_suppkey % 3 = 0` survivor in one administrative batch.
    * Idempotent: the replayed delete finds no live matching row (all
    * tombstoned) and commits nothing.
    */
  private def cdcDeleteRoot(s: SparkSession, d: String): String =
    synchronized {
      val root = supplierCdcRoot(s, d, "cdc_delete_q")
      graft.streaming.CdcApply.deleteWhere(s, root,
        col("s_suppkey") % 3 === 0, commitTs = Some(3000L))
      root
    }

  /** Snapshot root for `q_cdc_update`: the two-batch stream applied,
    * then [[graft.streaming.CdcApply.updateWhere]] posts a correction
    * (+1000 balance for nation 3) as one administrative batch.
    * Idempotent via a no-second-run guard: a re-run's updateWhere
    * would re-match and bump again, so the root applies it only when
    * the head is still 1 (the replay-guard pattern, driver-side).
    */
  private def cdcUpdateRoot(s: SparkSession, d: String): String =
    synchronized {
      val root = supplierCdcRoot(s, d, "cdc_update_q")
      if (graft.streaming.CdcApply.currentVersion(s, root).contains(1L))
        graft.streaming.CdcApply.updateWhere(s, root,
          col("s_nationkey") === 3,
          Map("s_acctbal" -> (col("s_acctbal") + lit(1000.0))),
          commitTs = Some(3000L))
      root
    }

  /** Snapshot root for `q_cdc_governed` — its own artifact dir (NOT
    * `cdcQueryRoot`): registering a location governs it for the whole
    * session, and the ungoverned CDC queries must keep reading their
    * root under the open default.
    */
  private def cdcGovRoot(s: SparkSession, d: String): String =
    synchronized { supplierCdcRoot(s, d, "cdc_gov_q") }

  /** Snapshot root for `q_cdc_changes` — its own artifact dir rather
    * than `cdcQueryRoot`: the change-feed stamp is stored at WRITE
    * time, so the feed query must build its snapshot with the current
    * build (a cached pre-stamp root would feed back empty).
    */
  private def cdcChangesRoot(s: SparkSession, d: String): String =
    synchronized { supplierCdcRoot(s, d, "cdc_changes_q") }

  /** Mirror root for `q_cdc_mirror`: an incremental replica of
    * [[cdcChangesRoot]] built through `syncMirror` (the change feed
    * applied under the mirror's replay-guard watermark). Idempotent:
    * once the mirror watermark reaches the source's current batch,
    * re-syncs are no-ops.
    */
  private def cdcMirrorRoot(s: SparkSession, d: String): String =
    synchronized {
      val src = cdcChangesRoot(s, d)
      val root = new java.io.File("target/graft-data/cdc_mirror_q/" +
        graft.sources.Artifacts.datasetKey(d, s"$d/supplier.parquet") +
        s"_$CdcRecipeRev").getAbsolutePath
      graft.streaming.CdcApply.syncMirror(s, src, root, numBuckets = 4)
      root
    }

  /** Snapshot root for `q_cdc_schema_evo`: batch 0 delivers three
    * columns, batch 1 delivers a FOURTH (`s_bonus`, exact-integer
    * valued so the oracle is arithmetic-hazard-free) on a subset of
    * keys — additive schema evolution mid-stream. The merged snapshot
    * must surface NULL bonus on every pre-evolution row.
    */
  private def cdcSchemaEvoRoot(s: SparkSession, d: String): String =
    synchronized {
      import graft.streaming.CdcApply
      val root = new java.io.File("target/graft-data/cdc_evo_q/" +
        graft.sources.Artifacts.datasetKey(d, s"$d/supplier.parquet") +
        s"_$CdcRecipeRev").getAbsolutePath
      val sup = Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"))
      CdcApply.applyBatch(sup.withColumn("version", lit(1L)), 0L, root,
        Seq("s_suppkey"), "version", None, commitTs = Some(1000L))
      CdcApply.applyBatch(
        sup.filter(col("s_suppkey") % 3 === 0)
          .withColumn("s_bonus", col("s_suppkey") % 10)
          .withColumn("version", lit(2L)),
        1L, root, Seq("s_suppkey"), "version", None,
        commitTs = Some(2000L))
      root
    }

  /** Snapshot root for `q_rebucket`: the same two-batch change stream,
    * then a bucket-count evolution (creation-time 16 → 5). Idempotent
    * like every artifact build — the replay guard no-ops the re-applies
    * and `rebucket` no-ops once the manifest already records 5.
    */
  private def cdcRebucketRoot(s: SparkSession, d: String): String =
    synchronized {
      val root = supplierCdcRoot(s, d, "cdc_rebucket_q")
      graft.streaming.CdcApply.rebucket(s, root, 5)
      root
    }

  /** The aggregate list behind `q_cdc_rollup` — dsum so the partial-
    * then-combine total is decimal-exact (FP order never bleeds into
    * the hash), max to exercise a non-decremental aggregate that only
    * stays exact because the sync RECOMPUTES touched buckets.
    */
  private def rollupAggs = Seq(
    graft.streaming.Rollup.Agg("cnt", "count"),
    graft.streaming.Rollup.Agg("total_bal", "dsum", "s_acctbal"),
    graft.streaming.Rollup.Agg("max_bal", "max", "s_acctbal"))

  /** Rollup root for `q_cdc_rollup`: the supplier change stream applied
    * INTERLEAVED with rollup syncs (batch 0 → sync → batch 1 → sync),
    * so the artifact's second sync is a genuine trickle refresh — only
    * the buckets batch 1 rewrote are recomputed, every other partial
    * is carried forward by the rollup table's own manifest. Idempotent
    * like every CDC artifact: replay guards no-op the re-applies and
    * re-syncs on rebuild.
    */
  private def cdcRollupRoot(s: SparkSession, d: String): String =
    synchronized {
      import graft.streaming.{CdcApply, Rollup}
      val key = graft.sources.Artifacts.datasetKey(d,
        s"$d/supplier.parquet") + s"_$CdcRecipeRev"
      val src = new java.io.File(
        s"target/graft-data/cdc_rollup_src/$key").getAbsolutePath
      val roll = new java.io.File(
        s"target/graft-data/cdc_rollup_q/$key").getAbsolutePath
      val (b0, b1) = supplierCdcBatches(s, d)
      CdcApply.applyBatch(b0, 0L, src, Seq("s_suppkey"), "version",
        Some("deleted"), commitTs = Some(1000L))
      Rollup.syncRollup(s, src, roll, Seq("s_nationkey"), rollupAggs,
        numBuckets = 4, commitTs = Some(1100L))
      CdcApply.applyBatch(b1, 1L, src, Seq("s_suppkey"), "version",
        Some("deleted"), commitTs = Some(2000L))
      Rollup.syncRollup(s, src, roll, Seq("s_nationkey"), rollupAggs,
        numBuckets = 4, commitTs = Some(2100L))
      roll
    }

  /** (source, index) roots for `q_lookup_by`: the supplier change
    * stream applied INTERLEAVED with secondary-index syncs (batch 0 →
    * sync → batch 1 → sync) on `s_nationkey`, so the second sync is a
    * genuine incremental refresh — only the source buckets batch 1
    * rewrote are recomputed, every other index entry carried forward,
    * and batch 1's deletes must TOMBSTONE their index pairs (a %7
    * supplier that stayed indexed would surface in the lookup and
    * hash-mismatch). Idempotent via the replay guards, as every CDC
    * artifact.
    */
  private def cdcIndexRoots(s: SparkSession, d: String): (String, String) =
    synchronized {
      import graft.streaming.{CdcApply, SecondaryIndex}
      val key = graft.sources.Artifacts.datasetKey(d,
        s"$d/supplier.parquet") + s"_$CdcRecipeRev"
      val src = new java.io.File(
        s"target/graft-data/cdc_index_src/$key").getAbsolutePath
      val idx = new java.io.File(
        s"target/graft-data/cdc_index_q/$key").getAbsolutePath
      val (b0, b1) = supplierCdcBatches(s, d)
      CdcApply.applyBatch(b0, 0L, src, Seq("s_suppkey"), "version",
        Some("deleted"), commitTs = Some(1000L))
      SecondaryIndex.syncIndex(s, src, idx, Seq("s_nationkey"),
        numBuckets = 4, commitTs = Some(1100L))
      CdcApply.applyBatch(b1, 1L, src, Seq("s_suppkey"), "version",
        Some("deleted"), commitTs = Some(2000L))
      SecondaryIndex.syncIndex(s, src, idx, Seq("s_nationkey"),
        numBuckets = 4, commitTs = Some(2100L))
      (src, idx)
    }

  /** Roots for the quality-gate queries (`q_quality_gate`,
    * `q_quarantine`): the supplier stream routed through
    * [[graft.streaming.Quality.applyChecked]] under two expectations —
    * `acctbal_nonneg` (s_acctbal >= 0; the raw data violates it
    * naturally at sf >= 0.01) and `name_present` (non-empty s_name;
    * batch 1 deterministically corrupts the name of every
    * s_suppkey % 4 == 0 update to NULL, so the gate provably fires at
    * EVERY scale factor and the NULL-fails-closed rule is in the
    * declared artifact, not just the spec). Batch 1 updates every
    * s_suppkey % 2 == 0 supplier (s_acctbal - 500, pushing some
    * balances negative) and deletes every % 7 == 0 key — deletes
    * bypass the gate by contract. The main snapshot therefore serves
    * "the latest ADMITTED version per key" and the quarantine table
    * "the latest REJECTED version per key with its reasons" — both
    * closed-form over the supplier table, so both are hash-checked.
    * Idempotent via both tables' replay guards.
    */
  private def cdcGateRoots(s: SparkSession, d: String): (String, String) =
    synchronized {
      import graft.streaming.Quality
      val key = graft.sources.Artifacts.datasetKey(d,
        s"$d/supplier.parquet") + s"_$CdcRecipeRev"
      val main = new java.io.File(
        s"target/graft-data/cdc_gate_q/$key").getAbsolutePath
      val quar = new java.io.File(
        s"target/graft-data/cdc_gate_quar/$key").getAbsolutePath
      val exps = Seq(
        Quality.Expectation("acctbal_nonneg", col("s_acctbal") >= 0),
        Quality.Expectation("name_present",
          col("s_name").isNotNull && length(col("s_name")) > 0))
      val sup = Tables.supplier(s, d)
      val b0 = sup.withColumn("version", lit(1L))
        .withColumn("deleted", lit(false))
      val updates = sup.filter(col("s_suppkey") % 2 === 0)
        .withColumn("s_acctbal", col("s_acctbal") - lit(500.0))
        .withColumn("s_name",
          when(col("s_suppkey") % 4 === 0, lit(null).cast("string"))
            .otherwise(col("s_name")))
        .withColumn("version", lit(2L))
        .withColumn("deleted", lit(false))
      val deletes = sup.filter(col("s_suppkey") % 7 === 0)
        .withColumn("version", lit(3L))
        .withColumn("deleted", lit(true))
      def gate(b: org.apache.spark.sql.DataFrame, id: Long, ts: Long) =
        Quality.applyChecked(b, id, main, quar, Seq("s_suppkey"),
          "version", Some("deleted"), exps, numBuckets = 4,
          commitTs = Some(ts))
      gate(b0, 0L, 1000L)
      gate(updates.unionByName(deletes), 1L, 2000L)
      (main, quar)
    }

  /** Chain root for `q_cdc_chain`: a mirror OF THE MIRROR — the
    * replication-chain claim made concrete. The chain syncs from
    * [[cdcMirrorRoot]]'s own change feed (the mirror is a full CDC
    * table), so the second hop exercises stamps written by a sync, not
    * by an original apply.
    */
  private def cdcChainRoot(s: SparkSession, d: String): String =
    synchronized {
      val mir = cdcMirrorRoot(s, d)
      val root = new java.io.File("target/graft-data/cdc_chain_q/" +
        graft.sources.Artifacts.datasetKey(d, s"$d/supplier.parquet") +
        s"_$CdcRecipeRev").getAbsolutePath
      graft.streaming.CdcApply.syncMirror(s, mir, root, numBuckets = 4)
      root
    }

  /** Knuth multiplicative scramble (id mod 2^32) * 2654435761 mod 2^32,
    * overflow-free for ANY long id: the multiplier is split into
    * 40503 * 2^16 + 31153 so every intermediate product stays under
    * 2^48. Public for the overflow unit test (OperatorsSpec).
    */
  def trainShuffleKey(id: Column): Column = {
    val m = lit(4294967296L) // 2^32
    val a = pmod(id, m)
    val hi = pmod(a * lit(40503L), lit(65536L)) * lit(65536L)
    pmod(hi + a * lit(31153L), m)
  }

  /** DuckDB SQL twin of [[trainShuffleKey]], built ONCE so the five
    * oracle queries that scramble cannot drift from the Spark form (or
    * from each other) when the formula changes.
    */
  private def scrambleSql(e: String): String =
    s"((($e % 4294967296) * 40503 % 65536) * 65536 + " +
      s"($e % 4294967296) * 31153) % 4294967296"

  /** Per-dataset persisted MinHash signature index (k=32); the path
    * embeds the source fingerprint so regenerated data rebuilds it.
    */
  private def minhashSigs(s: SparkSession, d: String) =
    Dedup.persistedSignatures(Tables.documents(s, d), "doc_id", "text",
      k = 32, "target/graft-data/minhash_sigs/" +
        graft.sources.Artifacts.datasetKey(d, s"$d/documents.parquet"))

  /** Per-dataset persisted VERIFIED near-dup pair index (exact Jaccard
    * >= 0.5 over the MinHash candidates): one-time build shared by the
    * verification query and cluster resolution. `assertUncapped` makes
    * the build fail loudly if any LSH band bucket exceeds the cap — the
    * second precondition (besides banding recall) for comparing this
    * pair set to the exhaustive all-pairs oracle below.
    */
  private def verifiedPairs(s: SparkSession, d: String) =
    Dedup.persistedVerifiedPairs(Tables.documents(s, d), "doc_id", "text",
      minhashSigs(s, d), k = 32, bands = 8, threshold = 0.5,
      "target/graft-data/verified_pairs/" +
        graft.sources.Artifacts.datasetKey(d, s"$d/documents.parquet"),
      assertUncapped = true)

  /** Persisted near-dup cluster membership (keepers over the
    * transitive closure of the verified pairs) — the one-time
    * resolution build shared by the cluster listing and the
    * leakage-safe split.
    */
  private def membership(s: SparkSession, d: String) =
    Dedup.persistedMembership(Tables.documents(s, d), "doc_id",
      verifiedPairs(s, d).select("id_a", "id_b"),
      "target/graft-data/dedup_clusters/" +
        graft.sources.Artifacts.datasetKey(d, s"$d/documents.parquet"))

  val queries: Map[String, Q] = Map(

    // C1 — exact dedup: content-hash group-by; shuffles hashes, not text.
    "q_dedup_exact" -> ((s, d) =>
      Dedup.exact(Tables.documents(s, d), "doc_id", "text")
        .select(col("content_hash"), col("doc_id"), col("n_copies"))
        .orderBy(col("doc_id"))),

    // C2 — corpus stats by language: pure map-side text measures + one agg.
    "q_text_stats" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("lang"), col("n_chars"),
          T.tokenCount(col("text")).as("n_tokens"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          sum(col("n_tokens")).as("total_tokens"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"),
          (sum(col("n_chars")).cast(DoubleType) / count(lit(1)))
            .as("avg_chars"))
        .orderBy(col("lang"))),

    // C2b — per-document token counting: whitespace + BPE-ish subword regex.
    "q_token_count" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 500)
        .select(col("doc_id"),
          T.tokenCount(col("text")).as("ws_tokens"),
          T.subTokenCount(col("text")).as("sub_tokens"))
        .orderBy(col("doc_id"))),

    // C1f — EXACT Jaccard similarity self-join (AllPairs/PPJoin
    // prefix filter): every document pair with token-set Jaccard
    // >= 0.4 — the LOSSLESS complement of the MinHash path (LSH can
    // miss a pair; this cannot, proven by the naive quadratic
    // oracle). Candidates join only on each set's rarest tokens, so
    // stopwords never explode the join.
    "q_jaccard_simjoin" -> ((s, d) =>
      graft.operators.SetSimilarity.jaccardSelfJoin(
        Tables.documents(s, d).filter(col("doc_id") < 400),
        "doc_id",
        filter(split(trim(col("text")), "\\s+"), x => x =!= ""),
        t = 0.4)
        .orderBy(col("id_a"), col("id_b"))),

    // C1e — edit-distance similarity SELF-JOIN (Ed-Join/PPJoin prefix
    // filter): all customer-name pairs within Levenshtein 1, found by
    // joining only on each string's q·d+1 RAREST q-grams — hot grams
    // carry no pairs, so the join never goes all-pairs; the oracle is
    // the naive quadratic levenshtein, which proves the filter
    // LOSSLESS (a pruned true pair would hash-mismatch).
    "q_edit_simjoin" -> ((s, d) =>
      graft.operators.EditSimilarity.selfJoin(
        Tables.customer(s, d).filter(col("c_custkey") <= 2000)
          .select(col("c_custkey"), col("c_name")),
        "c_custkey", "c_name", d = 1, q = 2)
        .select(col("id_a"), col("id_b"),
          col("dist").cast(LongType).as("dist"))
        .orderBy(col("id_a"), col("id_b"))),

    // C2b'' — weight-proportional sampling without replacement
    // (Duffield–Lund–Thorup priority sampling): id-derived exact
    // uniforms over token-count weights, k smallest u/w priorities.
    // One map-side projection + TakeOrdered — sampling 1M docs of
    // 100 TB costs one scan; the exact-IEEE priority makes the whole
    // sample hash-checkable.
    "q_weighted_sample" -> ((s, d) =>
      graft.operators.Sampling.prioritySample(
        Tables.documents(s, d)
          .select(col("doc_id"), T.tokenCount(col("text")).as("w")),
        "doc_id", col("w"), 50)),

    // C2b' — sequence-length histogram: the batching/packing planner's
    // first question ("how many docs land in each 16-token bucket")
    // as one map-side bucket projection + two-phase count — one scan
    // at any corpus size, the same shape the packing operator's
    // capacity planning reads.
    "q_length_histogram" -> ((s, d) =>
      Tables.documents(s, d)
        .select((floor(T.tokenCount(col("text")) / lit(16)) * 16)
          .cast(LongType).as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("bucket"))),

    // C2c — heuristic quality scoring (length / char-class ratios).
    "q_quality_score" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 500)
        .select(col("doc_id"),
          length(col("text")).cast(LongType).as("char_len"),
          (T.alphaChars(col("text")).cast(DoubleType) /
            length(col("text")).cast(DoubleType)).as("alpha_ratio"),
          T.qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id"))),

    // C2 + governance composite — free-text PII redaction at corpus
    // scale. The reference masks PII COLUMNS at query time
    // (outputs.tf:48-49); a training pipeline must also scrub PII
    // embedded in the text itself before the corpus leaves the governed
    // zone. The synthetic corpus is word soup, so deterministic PII is
    // planted per row — with the identical construction in the oracle —
    // and the per-language char/placeholder sums hash-prove the scrub
    // byte-for-byte. Pure map-side regexp_replace + one aggregation.
    "q_pii_scrub" -> ((s, d) => {
      val ssn = concat(
        lpad(pmod(col("doc_id") * 7, lit(1000)).cast("string"), 3, "0"),
        lit("-"),
        lpad(pmod(col("doc_id") * 13, lit(100)).cast("string"), 2, "0"),
        lit("-"),
        lpad(pmod(col("doc_id") * 31, lit(10000)).cast("string"), 4, "0"))
      val planted = concat(substring(col("text"), 1, 40),
        lit(" reach user"), col("doc_id").cast("string"),
        lit("@example.com id "), ssn, lit(" end"))
      def marks(c: Column, tok: String): Column =
        sum(length(c) - length(regexp_replace(c, tok, "")))
          .cast(LongType)
      Tables.documents(s, d)
        .select(col("lang"), planted.as("planted"),
          T.scrubPii(planted).as("scrubbed"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("planted"))).cast(LongType).as("raw_chars"),
          sum(length(col("scrubbed"))).cast(LongType).as("scrubbed_chars"),
          marks(col("scrubbed"), "<EMAIL>").as("email_mark_chars"),
          marks(col("scrubbed"), "<ID>").as("id_mark_chars"))
        .orderBy(col("lang"))
    }),

    // C3 — exact cosine top-k similarity search (brute-force baseline;
    // integer-quantized dot → bit-identical ranking across engines).
    "q_embed_topk" -> ((s, d) =>
      Ann.bruteForceTopK(Tables.embeddings(s, d), "vec_id", "embedding",
        queryId = 0L, k = 10)),

    // C5 — tumbling-window event counts. The aggregation body is
    // graft.streaming.EventStream.hourlyCounts — literally the same
    // function that runs incrementally under readStream/writeStream with a
    // watermark (see EventStreamSpec); on this batch input the watermark
    // node is eliminated and it is a plain two-phase hash aggregate.
    "q_stream_window" -> ((s, d) =>
      graft.streaming.EventStream.hourlyCounts(Tables.events(s, d))
        .withColumn("hour_ts", col("hour_ts").cast("timestamp_ntz"))
        .orderBy(col("hour_ts"), col("event_type"))),

    // C5b — per-user sessionization (30-minute gap) via the built-in
    // session_window; state per open session on a stream.
    "q_sessionize" -> ((s, d) =>
      graft.streaming.EventStream.sessionize(Tables.events(s, d))
        .withColumn("session_start",
          col("session_start").cast("timestamp_ntz"))
        .orderBy(col("user_id"), col("session_start"))),

    // C5c — the SAME sessionization through the typed
    // flatMapGroupsWithState API (custom-state surface for logic the
    // built-in window can't express); checked against the identical
    // oracle as q_sessionize.
    "q_sessionize_typed" -> ((s, d) =>
      graft.streaming.TypedSessionize.sessionize(s, Tables.events(s, d),
          gapMinutes = 30)
        .orderBy(col("user_id"), col("session_start"))),

    // C5d — interval join (stream-stream join family, batch form): each
    // purchase paired with the same user's views from the preceding hour,
    // then aggregated per purchase. The body is EventStream.intervalJoin —
    // the same function runs as a watermarked stream-stream join
    // (EventStreamSpec); here the watermark-free batch plan is an equality
    // join on user_id with the time range as a join-side filter.
    "q_interval_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val p = ev.filter(col("event_type") === "purchase")
        .filter(col("event_id") < 3000)
        .select(col("event_id"), col("user_id"), col("ts"))
      val v = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
          col("value").as("v_value"))
      graft.streaming.EventStream.intervalJoin(p, v, "user_id", "v_user",
          "ts", "v_ts", "1 HOUR", "left_outer")
        .groupBy(col("event_id"), col("user_id"), col("ts"))
        .agg(count(col("v_ts")).as("n_views_1h"),
          dsum(col("v_value")).as("view_value_1h"))
        .orderBy(col("event_id"))
    }),

    // Partition-pruned daily slice: events materialized partitioned by
    // event_date (the 100 TB fact layout) — the date predicate prunes
    // whole partitions at plan time (PartitionFilters in .explain), so
    // scan cost is 1/30th of the table here and 1/N in general.
    "q_partition_prune" -> ((s, d) =>
      Tables.eventsByDate(s, d)
        .filter(col("event_date") === lit("2024-01-15").cast("date"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("total_value"))
        .orderBy(col("event_type"))),

    // Dynamic partition pruning — the join-driven twin of
    // q_partition_prune: the fact table is joined to the derived date
    // dimension filtered on a STORED attribute (dom_mod), so no static
    // predicate on event_date exists at plan time; Catalyst's
    // PartitionPruning rule attaches the broadcast dimension's surviving
    // keys to the fact scan as a runtime DynamicPruningExpression and
    // only the matching date partitions are read (plan-asserted in
    // DppSpec). At 100 TB this is THE star-schema scan-cost mechanism:
    // scan cost follows the dimension filter, not the fact size.
    "q_dpp_join" -> ((s, d) => {
      val fact = Tables.eventsByDate(s, d)
      val dim = Tables.dateDim(s, d).filter(col("dom_mod") === 3)
      fact.join(broadcast(dim), col("event_date") === col("d"))
        .groupBy(col("event_date"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("total_value"))
        .orderBy(col("event_date"), col("event_type"))
    }),

    // C6 — distinct users per event type (exact, for the oracle; the HLL
    // variant is q_hll_distinct below).
    "q_approx_distinct" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("cnt"))
        .orderBy(col("event_type"))),

    // JSON extraction from the events props column.
    "q_json_extract" -> ((s, d) =>
      Tables.events(s, d)
        .filter(col("event_id") < 500)
        .select(col("event_id"), col("event_type"),
          get_json_object(col("props"), "$.k").cast(LongType).as("k_val"))
        .orderBy(col("event_id"))),

    // ---- rows-only checked (approximate / hash-specific semantics) ----

    // HLL sketch distinct — the scale path for C6 (one pass, no shuffle of
    // raw user ids, mergeable partial sketches).
    "q_hll_distinct" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
        .orderBy(col("event_type"))),

    // C6b — count-min sketch token frequencies: the exact top-10 vocab
    // words probed against a CMS whose size (4 × 4096 cells) is
    // independent of the corpus — the frequency sibling of
    // q_hll_distinct. est_cnt never undercounts; ToleranceSpec pins
    // the CMS epsilon bound against the exact counts. Rows-only:
    // xxhash64 cell placement is engine-specific.
    "q_cms_freq" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(explode(T.tokens(col("text"))).as("word"))
      val top = toks.groupBy(col("word"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word"))
        .limit(10)
        .select(col("word"))
      val sk = graft.operators.CountMin.sketch(toks, "word", 4096, 4)
      graft.operators.CountMin.estimate(sk, top, "word", 4096, 4)
        .orderBy(col("est_cnt").desc, col("word"))
    }),

    // C4 — MinHash+LSH near-dup candidates: top pairs by estimated Jaccard.
    // k=32, bands=8 (r=4) puts the banding S-curve threshold near
    // Jaccard 0.59 — the planted near-dups (J ≈ 0.98) always collide,
    // random word-soup pairs (J ≈ 0.05) essentially never do. Signatures
    // come from the persisted per-dataset index (built once, shared with
    // q_ngram_jaccard and re-runs).
    "q_minhash_dup" -> ((s, d) =>
      Dedup.minhashCandidatesFromSigs(minhashSigs(s, d), k = 32, bands = 8)
        .orderBy(col("est_jaccard").desc, col("id_a"), col("id_b"))
        .limit(50)),

    // SimHash near-dup candidates: closest pairs by Hamming distance.
    // 16-bit chunks → 4 chunks (Hamming ≤ 3 recall), 65,536-way buckets.
    // bucketCap=100: this small-vocab corpus clusters fingerprints (top
    // chunk buckets reach ~200 docs ⇒ 250k candidate pairs); capping
    // drops only clustered-but-unrelated buckets — true near-dups sit at
    // Hamming 0-1 and re-collide in all 4 chunk buckets, so recall holds.
    // The declared query takes a doc_id slice like its siblings (the
    // fingerprint clustering made the full-corpus form ~15% of the whole
    // bench total, drowning the signal of every other query); the
    // full-corpus form stays exercised by DedupSpec and the pigeonhole
    // contract in ToleranceSpec.
    "q_simhash_dup" -> ((s, d) =>
      Dedup.simhashCandidates(
        Tables.documents(s, d).filter(col("doc_id") < 2000),
        "doc_id", "text", chunkBits = 16, bucketCap = 100)
        .orderBy(col("hamming"), col("id_a"), col("id_b"))
        .limit(20)),

    // Exact n-gram Jaccard verification of the MinHash candidates — the
    // dedup pipeline's verify stage, served from the persisted verified-
    // pair index (built once per corpus: signatures → banded candidates →
    // semi-join-pruned shingles → exact Jaccard >= 0.5).
    // Oracle-checked against a DuckDB ALL-pairs exact-Jaccard scan: the
    // banding parameters (k=32, bands=8, r=4) collide a J>=0.9 pair with
    // probability 1-(1-0.9^4)^8 ~ 0.9998 and the corpus is bimodal (every
    // pair is J>=0.9 or J<0.2, no mid-band pairs), so the candidate set
    // provably contains every pair the threshold keeps — making the
    // LSH-pruned pipeline hash-comparable to the exhaustive oracle.
    // Second precondition: no band bucket may exceed the bucket cap
    // (star fallback would drop non-anchor pairs from the verified set);
    // the index build asserts this (persistedVerifiedPairs
    // assertUncapped), so a denser corpus fails loudly at build time
    // instead of confusingly at oracle compare.
    "q_ngram_jaccard" -> ((s, d) =>
      verifiedPairs(s, d).orderBy(col("id_a"), col("id_b"))),

    // Duplicate-cluster resolution over the verified near-dup pairs:
    // connected components (min-label propagation with pointer-jumping —
    // Dedup.clusters) + keeper selection, one row per document. The
    // star-fallback candidate design depends on exactly this stage to
    // recover mega-clusters from their O(n) anchor edges. Oracle: DuckDB
    // recursive-CTE transitive closure over the same thresholded pair set.
    // Served from the PERSISTED membership artifact (the pointer-
    // jumping fixpoint is a one-time resolution build, like the
    // signature/verified-pair indexes it reads).
    "q_dedup_clusters" -> ((s, d) =>
      membership(s, d).orderBy(col("doc_id"))),

    // C1c — leakage-safe train/val/test split: the split key is the
    // near-dup CLUSTER id, so a near-duplicate of a training document
    // can never land in val/test (the eval-integrity property a
    // per-document split silently violates — Dedup.splitByCluster).
    // Cluster resolution reuses the verified-pair index; the split
    // itself is a map-side projection (shuffles nothing). Oracle:
    // recursive-CTE transitive closure + the shared scramble formula,
    // so a wrong cluster id or a drifted scramble both hash-mismatch
    // the per-split census.
    "q_leakage_split" -> ((s, d) =>
      Dedup.splitByCluster(membership(s, d),
        trainShuffleKey(col("cluster_id")))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("cluster_id")).as("n_clusters"))
        .orderBy(col("split"))),

    // Embedding-cosine near-dup via hyperplane LSH buckets.
    "q_embed_neardup" -> ((s, d) =>
      Ann.lshNearDupPairs(Tables.embeddings(s, d), "vec_id", "embedding",
        bits = 12)
        .orderBy(col("sim").desc, col("id_a"), col("id_b"))
        .limit(20)),

    // IVF-style ANN over the LIST-PARTITIONED embedding layout: centroids
    // from the PERSISTED index (built once per dataset); the probe filter
    // prunes whole label=<list> partitions at plan time, so scan cost is
    // ~nprobe/nlists of the table — the 100 TB posture on both axes.
    "q_ann_ivf" -> ((s, d) => {
      val emb = Tables.embeddingsByList(s, d)
      val cents = Ann.persistedCentroids(emb, "label", "embedding",
        "target/graft-data/ivf_centroids/" +
          graft.sources.Artifacts.datasetKey(d, s"$d/embeddings.parquet"))
      Ann.ivfTopK(emb, cents, "vec_id", "label", "embedding",
        queryId = 0L, k = 10, nprobe = 3)
    }),

    // C3c — INCREMENTAL vector index under the hash gate: the base
    // embeddings then a SQL-reconstructible second batch (shifted-id
    // copies of every %7 vector) ingested into a label-bucketed CDC
    // table (Ann.incrementalIngest); the probe reads ONLY the probed
    // labels' bucket families via scanByBucketValues, centroids stay
    // the fixed persisted base index (offline-retrain posture). The
    // oracle runs exhaustive IVF over the UNION corpus, so a vector
    // lost or duplicated across batches, a stale bucket, or a broken
    // label probe all hash-mismatch. Idempotent: replayed ingests
    // no-op on the CDC replay guard.
    "q_ann_incremental" -> ((s, d) => {
      val root = new java.io.File("target/graft-data/ann_incr/" +
        graft.sources.Artifacts.datasetKey(d, s"$d/embeddings.parquet") +
        "_rev1").getAbsolutePath
      synchronized {
        val emb = Tables.embeddings(s, d)
          .select(col("vec_id"), col("label"), col("embedding"))
        val extra = emb
          .filter(col("vec_id") % 7 === 0 && col("vec_id") =!= 0)
          .select((col("vec_id") + lit(1000000L)).as("vec_id"),
            col("label"), col("embedding"))
        Ann.incrementalIngest(emb, root, "vec_id", "label",
          "embedding", 0L)
        Ann.incrementalIngest(extra, root, "vec_id", "label",
          "embedding", 1L)
        val cents = Ann.persistedCentroids(Tables.embeddingsByList(s, d),
          "label", "embedding", "target/graft-data/ivf_centroids/" +
            graft.sources.Artifacts.datasetKey(d,
              s"$d/embeddings.parquet"))
        val qv = Tables.embeddings(s, d).filter(col("vec_id") === 0)
          .select(col("embedding"))
        Ann.ivfTopKIncremental(s, root, cents, "label", qv,
          queryId = 0L, k = 10, nprobe = 3)
      }
    }),

    // Self-contained IVF: the coarse quantizer is TRAINED (deterministic
    // integer-quantized k-means, Ann.kmeans) instead of taken from the
    // data's label column — the full index-build + probe path a user
    // without pre-clustered vectors runs. Rows-only: the iterative
    // clustering is deterministic but not practically SQL-expressible;
    // AnnSpec's recovery test on planted clusters is its exact twin.
    "q_ann_kmeans" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cents = Ann.persistedKmeans(emb, "vec_id", "embedding",
        k = 8, iters = 3, "target/graft-data/kmeans_centroids/" +
          graft.sources.Artifacts.datasetKey(d, s"$d/embeddings.parquet"))
      val lists = Ann.assignLists(
        emb.select(col("vec_id").as("vid"), col("embedding").as("v")),
        cents)
      Ann.ivfTopK(
        emb.join(lists.withColumnRenamed("vid", "vec_id"), "vec_id"),
        cents, "vec_id", "list", "embedding",
        queryId = 0L, k = 10, nprobe = 3)
    }),

    // Language-ID heuristic vs the labeled lang column (confusion counts).
    // Deterministic (stopword-profile argmax, lexicographic tie-break) and
    // SQL-expressible, so it is oracle-checked despite being a heuristic.
    "q_lang_id" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("lang"), T.langId(col("text")).as("pred_lang"))
        .groupBy(col("lang"), col("pred_lang"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("lang"), col("pred_lang"))),

    // Rolling-hash document fingerprints.
    "q_fingerprint" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 500)
        .select(col("doc_id"), T.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))),

    // C2d — vocabulary building: corpus-wide token frequencies, top 50.
    // Explode is map-side; the count is a two-phase hash aggregate on the
    // token — the standard first step of tokenizer training.
    "q_vocab_topk" -> ((s, d) =>
      Tables.documents(s, d)
        .select(explode(T.tokens(col("text"))).as("word"))
        .groupBy(col("word"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word"))
        .limit(50)),

    // C2f — TF-IDF-style top terms per document: term frequency × a
    // rational inverse-document-frequency (tf·N/df — a RATIO of exact
    // integers, one IEEE division, so the score is bit-identical across
    // engines; a libm log() would not be). N is the doc_id slice bound,
    // a FIXED scale constant — tf/df rankings are invariant to it, so it
    // need not equal the live corpus count. Explode is map-side; tf and
    // df are two-phase hash aggregates; top-3 per doc via a rank window.
    "q_tfidf_topk" -> ((s, d) => {
      val nDocs = 200L
      val tf = Tables.documents(s, d)
        .filter(col("doc_id") < nDocs)
        .select(col("doc_id"), explode(T.tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term"))
      tf.join(df, "term")
        .withColumn("score",
          (col("tf") * lit(nDocs)).cast(DoubleType) / col("df"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          col("score"))
        .orderBy(col("doc_id"), col("score").desc, col("term"))
    }),

    // C2e — C4-style quality gate: language + quality score + token-count
    // band. Pure map-side predicates over the corpus — the shape of every
    // large-scale pretraining-data filter.
    "q_quality_filter" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(col("lang") === "en")
        .filter(T.qualityScore(col("text")) > 0.75)
        .filter(T.tokenCount(col("text")).between(20, 60))
        .select(col("doc_id"), col("lang"),
          T.tokenCount(col("text")).as("n_tokens"),
          T.qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id"))),

    // C2g — benchmark decontamination: flag corpus documents sharing
    // 3-gram shingles with a held-out eval set (here: docs 0-9 stand in
    // for the benchmark). The eval shingle set is tiny by construction →
    // broadcast, so the corpus side never shuffles: explode shingles
    // map-side, hash-join against the broadcast set, one agg. At 100 TB
    // the eval set stays a few MB (real benchmarks are) and the scan is
    // embarrassingly parallel — the standard pretraining decontamination
    // shape (n-gram overlap against eval data).
    "q_decontaminate" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val docs = Tables.documents(s, d)
      val evalShingles = docs.filter(col("doc_id") < 10)
        .select(explode(array_distinct(T.shingles(col("text"), 3)))
          .as("shingle"))
        .distinct()
      docs.filter(col("doc_id") >= 10)
        .select(col("doc_id"),
          explode(array_distinct(T.shingles(col("text"), 3)))
            .as("shingle"))
        .join(broadcast(evalShingles), "shingle")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_overlap"))
        .withColumn("contaminated", col("n_overlap") >= 5)
        .orderBy(col("doc_id"))
    }),

    // C2g-scale — the same decontamination through a distributed BLOOM
    // filter: the eval set becomes a bounded bit table (<= m rows,
    // broadcast) instead of a broadcast of the shingles themselves —
    // the path for eval sets too large to broadcast (multi-benchmark
    // unions, dedup-against-prior-corpus). No false negatives by
    // construction (every truly contaminated doc flags); rows-only
    // (xxhash64 bit placement; false positives possible by design),
    // with the exact broadcast twin q_decontaminate oracle-checked and
    // ToleranceSpec pinning the no-false-negative + FP-rate bounds.
    "q_bloom_decontaminate" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val docs = Tables.documents(s, d)
      val eval = docs.filter(col("doc_id") < 10)
        .select(explode(array_distinct(T.shingles(col("text"), 3)))
          .as("shingle"))
      // the bit table is a persisted artifact keyed on the eval corpus
      // fingerprint + (m, k): re-runs and later corpus batches probe
      // the committed sketch instead of re-shingling the eval set
      val bits = graft.operators.Bloom.persistedBuild(eval, "shingle",
        m = 1L << 16, k = 5,
        path = new java.io.File("target/graft-data/bloom/eval_" +
          graft.sources.Artifacts.datasetKey(d,
            s"$d/documents.parquet")).getAbsolutePath)
      val probes = docs.filter(col("doc_id") >= 10)
        .select(col("doc_id"),
          explode(array_distinct(T.shingles(col("text"), 3)))
            .as("shingle"))
      graft.operators.Bloom
        .mightContain(bits, probes, "shingle", m = 1L << 16, k = 5)
        .groupBy(col("doc_id"))
        .agg(sum(when(col("might_contain"), 1L).otherwise(0L))
          .as("n_maybe"))
        .filter(col("n_maybe") >= 1)
        .withColumn("contaminated", col("n_maybe") >= 5)
        .orderBy(col("doc_id"))
    }),

    // C2h — repetition-based quality gate (the "fraction of duplicate
    // n-grams" family of pretraining filters): per document, the share
    // of bigram occurrences that are repeats. Pure map-side arithmetic
    // on exact integers (one IEEE division), so it is bit-stable and
    // oracle-checked despite being a heuristic.
    "q_repetition_filter" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      Tables.documents(s, d)
        .filter(col("doc_id") < 500)
        .select(col("doc_id"),
          size(T.shingles(col("text"), 2)).cast(LongType)
            .as("n_bigrams"),
          size(array_distinct(T.shingles(col("text"), 2))).cast(LongType)
            .as("n_distinct"))
        .withColumn("dup_frac",
          (col("n_bigrams") - col("n_distinct")).cast(DoubleType) /
            col("n_bigrams"))
        .withColumn("keep", col("dup_frac") <= lit(0.2))
        .orderBy(col("doc_id"))
    }),

    // C2i — data-mixture sampling: per-language keep quotas applied with
    // a DETERMINISTIC id-mod rule (reproducible across runs and engines,
    // unlike seeded Bernoulli sampling whose RNG is engine-specific),
    // reporting the achieved mixture. This is the pretraining "mixing
    // weights" op; at 100 TB it is a pure map-side filter + one agg —
    // no shuffle of kept rows, no sampling coordinator.
    "q_data_mixture" -> ((s, d) => {
      val quota = when(col("lang") === "en", 60)
        .when(col("lang") === "zh", 40).otherwise(20)
      Tables.documents(s, d)
        .filter(pmod(col("doc_id"), lit(100)) < quota)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("kept_docs"),
          sum(T.tokenCount(col("text"))).as("kept_tokens"))
        .orderBy(col("lang"))
    }),

    // C2j — reproducible corpus shuffle: training order randomized by a
    // Knuth multiplicative scramble of the id — exact integer arithmetic,
    // so the permutation is bit-identical across engines and runs (a
    // seeded rand() is neither). At scale the orderBy is a range-
    // partitioned sort: sampled split points, one shuffle, per-partition
    // sorts — the standard distributed shuffle-for-training pass.
    // The scramble is (id mod 2^32) * 2654435761 mod 2^32, computed as
    // two 48-bit-safe modmuls (multiplier split 40503*2^16 + 31153): a
    // single 64-bit product silently wraps for id >~ 3.5e9 (and diverges
    // from any wide-integer oracle; ANSI mode would throw). Identical to
    // the naive formula for every id < 2^32, overflow-free for all ids
    // (unit-checked against BigInt at id = 2^33).
    "q_train_shuffle" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), trainShuffleKey(col("doc_id"))
          .as("shuffle_key"))
        .orderBy(col("shuffle_key"), col("doc_id"))
        .limit(100)),

    // C2k — context-window chunking: each document split into fixed
    // token-budget training chunks (here 32 tokens) with the tail chunk
    // short. Entirely map-side (sequence + slice inside one projection,
    // then a generator) — the shape of every packing/chunking pass that
    // feeds a tokenizer at 100 TB.
    "q_doc_chunks" -> ((s, d) => {
      val chunkLen = 32
      Tables.documents(s, d)
        .filter(col("doc_id") < 300)
        .select(col("doc_id"), T.tokens(col("text")).as("toks"))
        // a zero-token document has no chunks (mirrors the oracle's
        // empty range()); without this, sequence(0, -1) would emit a
        // DESCENDING [0, -1] and fabricate two bogus chunks
        .filter(size(col("toks")) > 0)
        .select(col("doc_id"), explode(transform(
          sequence(lit(0),
            ceil(size(col("toks")) / lit(chunkLen.toDouble))
              .cast("int") - 1),
          i => struct(
            i.cast(LongType).as("chunk_idx"),
            concat_ws(" ",
              slice(col("toks"), i * chunkLen + 1, lit(chunkLen)))
              .as("chunk_text"),
            least(lit(chunkLen), size(col("toks")) - i * chunkLen)
              .cast(LongType).as("chunk_tokens")))).as("ch"))
        .select(col("doc_id"), col("ch.chunk_idx"), col("ch.chunk_text"),
          col("ch.chunk_tokens"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    // C2l — stratified train/val/test split: the scrambled id modulo 100
    // buckets rows 80/10/10, DETERMINISTICALLY (the same doc lands in
    // the same split on every run and every engine — a seeded
    // randomSplit is neither), and the per-(lang, split) report verifies
    // stratification: the scramble is independent of lang, so each
    // language splits ~80/10/10 internally. At 100 TB: one map-side
    // projection + a two-phase agg — assigning the split shuffles
    // NOTHING; only the report aggregates.
    "q_train_split" -> ((s, d) => {
      val bucket = pmod(trainShuffleKey(col("doc_id")), lit(100L))
      Tables.documents(s, d)
        .select(col("lang"),
          when(bucket < 80, "train").when(bucket < 90, "val")
            .otherwise("test").as("split"),
          T.tokenCount(col("text")).as("tok"))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("tokens"))
        .orderBy(col("lang"), col("split"))
    }),

    // C2m — sequence packing: shuffled docs concatenated into one token
    // stream, cut into 512-token context windows, each doc assigned the
    // window its first token falls in (Packing.packBins — a distributed
    // prefix sum, never a single-partition global window). The declared
    // query runs the STAGED path — the scale configuration, where the
    // prepared rows are materialized once and the offsets pass reads a
    // column-pruned projection of the staged parquet instead of
    // re-running scan + tokenize (fingerprint-keyed artifact dir, like
    // every other one-time layout build) — so the plan the oracle gate
    // certifies is the one-source-scan plan a 100 TB run would use
    // (single-scan claim machine-checked in OperatorsSpec). Reported as
    // per-bin doc counts + token mass over the first 50 bins.
    "q_pack_sequences" -> ((s, d) =>
      graft.operators.Packing.packBins(
        Tables.documents(s, d).filter(col("doc_id") < 2000)
          .select(col("doc_id"), col("text"),
            trainShuffleKey(col("doc_id")).as("sk")),
        Seq(col("sk"), col("doc_id")), T.tokenCount(col("text")), 512L,
        stagingDir = Some(
          "target/graft-data/pack_staging/" +
            graft.sources.Artifacts.datasetKey(d,
              s"$d/documents.parquet")))
        .groupBy(col("bin_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("_tok")).as("bin_tokens"))
        .orderBy(col("bin_id"))
        .limit(50)),

    // C2n — per-group deterministic sample: the first 50 docs of each
    // language in scrambled-id order (eval-set construction: a fixed,
    // reproducible per-stratum draw; a seeded sampleBy is neither
    // stable across engines nor exactly sized). A naive
    // `row_number over (partition by lang)` funnels the WHOLE corpus
    // through one reducer per language — 5 tasks for 100 TB — so the
    // global rank runs after a LOCAL prune: every input partition keeps
    // its own top-50 per language first (parallelism = partitions ×
    // languages), and the lang-partitioned window then ranks at most
    // 50 × partitions survivors per language. Global top-50 ⊆ union of
    // per-partition top-50s, so the result is exact.
    "q_group_sample" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val scored = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          trainShuffleKey(col("doc_id")).as("sk"))
        .withColumn("_pid", spark_partition_id())
      val pruned = scored
        .withColumn("_lrk", row_number().over(
          Window.partitionBy(col("_pid"), col("lang"))
            .orderBy(col("sk"), col("doc_id"))))
        .filter(col("_lrk") <= 50)
      pruned
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("lang"))
            .orderBy(col("sk"), col("doc_id"))))
        .filter(col("rk") <= 50)
        .select(col("lang"), col("doc_id"), col("rk").cast(LongType)
          .as("rk"))
        .orderBy(col("lang"), col("rk"))
    }),

    // (sink) — small-file compaction under the correctness gate: the
    // fact table rewritten through Sinks.compactParquet (size-derived
    // file count, write-new-directory) and aggregated FROM THE COMPACTED
    // COPY; the oracle aggregates the original, so any row lost or
    // duplicated in the rewrite hash-mismatches. Artifact-idempotent
    // like every other one-time layout build.
    "q_compacted" -> ((s, d) => {
      import graft.sources.{Artifacts, Sinks}
      val out = new java.io.File("target/graft-data/events_compacted/" +
        Artifacts.datasetKey(d, s"$d/events.parquet"))
      Artifacts.commitOnce(s, out.getAbsolutePath)(tmp =>
        Sinks.compactParquet(s, s"$d/events.parquet", tmp,
          targetBytes = 4L << 20))
      val compacted = s.read.parquet(out.getAbsolutePath)
      compacted
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("total_value"))
        .orderBy(col("event_type"))
    }),

    // (sink) — Z-order layout under the correctness gate: the fact table
    // rewritten through ZOrder.cluster (rank-quantized Morton curve on
    // (user_id, value), one range shuffle) and aggregated FROM THE
    // CLUSTERED COPY with a predicate on the SECOND curve dimension —
    // the one a single-column sort cannot prune. The oracle runs the
    // same aggregate on the original table, so any row lost, duplicated,
    // or mutated by the layout rewrite hash-mismatches. The pruning
    // claim itself (file envelopes skip on either dimension) is
    // machine-checked in ZOrderSpec against per-file min/max envelopes.
    "q_zorder" -> ((s, d) => {
      import graft.sources.{Artifacts, ZOrder}
      val out = new java.io.File("target/graft-data/events_zorder/" +
        Artifacts.datasetKey(d, s"$d/events.parquet"))
      Artifacts.commitOnce(s, out.getAbsolutePath)(tmp =>
        ZOrder.cluster(s, s"$d/events.parquet", tmp,
          "user_id", "value", numFiles = 16))
      val clustered = s.read.parquet(out.getAbsolutePath)
      clustered
        .filter(col("value") >= 0 && col("value") <= 30)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("total_value"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type"))
    }),

    // C1+C2 composite — the cleaning-pipeline yield metric: exact-dedup
    // keepers that pass the quality gate, and how many tokens survive.
    "q_pipeline_tokens" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val keepers = Dedup.exact(docs, "doc_id", "text")
        .select(col("doc_id"))
      docs.join(keepers, "doc_id")
        .filter(T.qualityScore(col("text")) > 0.7)
        .agg(count(lit(1)).as("n_docs"),
          sum(T.tokenCount(col("text"))).as("surviving_tokens"))
    }),

    // C7 — JSONL dataset sink/source round-trip: the de-facto training-
    // data interchange format (one JSON object per line, splittable,
    // parallel parts — not the coalesced result-set CSV contract).
    // Re-read with a DECLARED schema (inference scans once to guess and
    // a field missing from early files silently drops the column), then
    // aggregated — proving the round trip is lossless.
    "q_jsonl_sink" -> ((s, d) => {
      import org.apache.spark.sql.types.{LongType => LT, StringType => ST,
        StructField => SF, StructType => STt}
      // keyed by dataset like every other persisted artifact (a fixed
      // path would interleave concurrent runs across datasets) and
      // commitOnce-guarded like them too: an unconditional overwrite
      // would let run B's rewrite race run A's read of the same dir
      val path = new java.io.File("target/graft-data/jsonl/docs_head_" +
        graft.sources.Artifacts.datasetKey(d, s"$d/documents.parquet"))
        .getAbsolutePath
      val subset = Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      graft.sources.Artifacts.commitOnce(s, path)(tmp =>
        graft.sources.Sinks.writeJsonl(subset, tmp))
      graft.sources.Sinks.readJsonl(s, path, STt(Seq(
          SF("doc_id", LT), SF("lang", ST), SF("n_chars", LT))))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy(col("lang"))
    }),

    // C7b — ORC dataset round trip, the twin of q_jsonl_sink on the
    // second columnar lake format: write a subset as ORC, re-read with
    // a declared schema, aggregate — lossless round trip proven against
    // the oracle computed from the original table.
    "q_orc_sink" -> ((s, d) => {
      import org.apache.spark.sql.types.{LongType => LT, StringType => ST,
        StructField => SF, StructType => STt}
      val path = new java.io.File("target/graft-data/orc/docs_head_" +
        graft.sources.Artifacts.datasetKey(d, s"$d/documents.parquet"))
        .getAbsolutePath
      val subset = Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      graft.sources.Artifacts.commitOnce(s, path)(tmp =>
        graft.sources.Sinks.writeOrc(subset, tmp))
      graft.sources.Sinks.readOrc(s, path, STt(Seq(
          SF("doc_id", LT), SF("lang", ST), SF("n_chars", LT))))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy(col("lang"))
    }),

    // ---- multimodal (binary payload columns; graft.multimodal) ----

    // Per-media-type size stats over the typed sidecar metadata (the
    // SOURCE asset's content length — image payloads themselves are
    // real PNG bytes whose encoded size no SQL oracle can reproduce).
    "q_media_stats" -> ((s, d) =>
      M.mediaFromDocs(Tables.documents(s, d))
        .groupBy(col("media_type"))
        .agg(count(lit(1)).as("n_media"),
          sum(col("meta.byte_len")).as("total_bytes"),
          max(col("meta.byte_len")).as("max_bytes"))
        .orderBy(col("media_type"))),

    // REAL image + audio decode and the stubbed video feature in ONE
    // map-side pass: image rows (genuine PNG payloads) decode to their
    // true dimensions and mean luma, audio rows (genuine WAV payloads)
    // parse through the JDK's own audio reader to rate/length/
    // loudness; rows of the other types decode NULL on each codec —
    // no media-type dispatch. Rows-only (PNG/WAV byte streams and
    // xxhash features are engine-specific); MultimodalSpec pins both
    // decodes exactly — dimensions and sample counts round-trip the
    // encoders' seed formulas bit-for-bit.
    "q_media_decode" -> ((s, d) =>
      M.mediaFromDocs(Tables.documents(s, d))
        .filter(col("media_id") < 200)
        .withColumn("img", M.decodeImage(col("payload")))
        .withColumn("au", M.decodeAudio(col("payload")))
        .select(col("media_id"), col("media_type"),
          col("img.width").as("width"),
          col("img.height").as("height"),
          round(col("img.mean_luma"), 2).as("mean_luma"),
          col("au.sample_rate").as("sample_rate"),
          col("au.n_samples").as("n_samples"),
          round(col("au.rms"), 4).as("rms"),
          round(col("au.peak"), 4).as("peak"),
          size(M.frameSample(col("payload"), 4, 16)).as("n_frames"),
          element_at(M.decodeStub(col("payload"), 8), 1).as("feat0"),
          M.payloadFingerprint(col("payload")).as("payload_fp"))
        .orderBy(col("media_id"))),

    // The video facet that IS oracle-checkable: frame count and
    // dimensions recovered by walking the REAL RIFF container and
    // JPEG-decoding every frame follow the encoder's seed formulas,
    // so DuckDB reproduces them from doc_id alone — a chunk-layout
    // slip, a miscounted frame, or a misdecoded dimension
    // hash-mismatches (pixel stats are JPEG-lossy: spec-bounded, not
    // oracled).
    "q_media_video" -> ((s, d) =>
      M.mediaFromDocs(Tables.documents(s, d))
        .filter(col("media_type") === "video" && col("media_id") < 400)
        .withColumn("v", M.decodeVideo(col("payload")))
        .select(col("media_id"), col("v.n_frames").as("n_frames"),
          col("v.width").as("width"), col("v.height").as("height"))
        .orderBy(col("media_id"))),

    // The audio half that IS oracle-checkable: the WAV header fields
    // the decode recovers (rate, sample count) follow the encoder's
    // seed formulas, so DuckDB reproduces them from doc_id alone —
    // a hash-checked proof the bytes round-trip the REAL JDK parser
    // (a malformed header, wrong data length, or byte-order slip
    // breaks rate or count; rms/peak stay spec-pinned).
    "q_media_audio" -> ((s, d) =>
      M.mediaFromDocs(Tables.documents(s, d))
        .filter(col("media_type") === "audio" && col("media_id") < 400)
        .withColumn("au", M.decodeAudio(col("payload")))
        .select(col("media_id"),
          col("au.sample_rate").as("sample_rate"),
          col("au.n_samples").as("n_samples"))
        .orderBy(col("media_id"))),

    // C8 — the partition-scoped CDC apply end-to-end as a DECLARED
    // query: a deterministic two-batch change stream (full insert load,
    // then updates + deletes with delete-wins versioning) merged into a
    // bucketed snapshot via CdcApply, final state read back through the
    // manifest and aggregated. The oracle computes the same net state
    // directly — updates applied where not superseded by a delete,
    // deleted keys absent — so every layer (bucketing, anti-join,
    // latest-wins window, tombstones, manifest pointer) is hash-checked,
    // not just spec-tested.
    "q_cdc_merge" -> ((s, d) =>
      graft.streaming.CdcApply.readSnapshot(s, cdcQueryRoot(s, d)).get
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("cnt"), dsum(col("s_acctbal")).as("total_bal"))
        .orderBy(col("s_nationkey"))),

    // C8d — predicate DELETE: every `% 3 = 0` survivor tombstoned in
    // one administrative batch through the ordinary apply path. The
    // oracle is the net state minus the erased keys, with the head
    // witness proving the delete committed as batch 2 — an un-deleted
    // row, a collaterally-deleted row, or a mutated survivor all
    // hash-mismatch.
    "q_cdc_delete" -> ((s, d) => {
      val root = cdcDeleteRoot(s, d)
      val wm = graft.streaming.CdcApply.currentVersion(s, root).get
      graft.streaming.CdcApply.readSnapshot(s, root).get
        .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"),
          lit(wm).as("head_batch"))
        .orderBy(col("s_suppkey"))
    }),

    // C8u — predicate UPDATE: a +1000 correction for one nation posted
    // through updateWhere. Oracle = net state with the correction
    // composed over the batch-1 update — order matters (%5 rows in
    // nation 3 get +100 then +1000) and both engines compose it the
    // same way; head witness proves one administrative batch.
    "q_cdc_update" -> ((s, d) => {
      val root = cdcUpdateRoot(s, d)
      val wm = graft.streaming.CdcApply.currentVersion(s, root).get
      graft.streaming.CdcApply.readSnapshot(s, root).get
        .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"),
          lit(wm).as("head_batch"))
        .orderBy(col("s_suppkey"))
    }),

    // C8r — RESTORE: the same stream rolled back to batch 0 as a NEW
    // commit. The oracle is the pristine batch-0 load (every update
    // reverted, every delete resurrected, versions verbatim), plus the
    // witnessed head: `head_batch = 2` proves the rollback ADVANCED the
    // watermark — a pointer rewind would read 1 and hash-mismatch.
    "q_cdc_restore" -> ((s, d) => {
      val root = cdcRestoreRoot(s, d)
      val wm = graft.streaming.CdcApply.currentVersion(s, root).get
      graft.streaming.CdcApply.readSnapshot(s, root).get
        .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"),
          col("version"), lit(wm).as("head_batch"))
        .orderBy(col("s_suppkey"))
    }),

    // C8s — the SAME net state through the THIRD entry point:
    // `spark.read.format("cdc")` (the DataFrameReader protocol shim,
    // graft.sources.CdcDataSource) — filters/pruning delegate into the
    // engine's snapshot plan; hash-checked against the identical
    // net-state oracle as q_cdc_merge, so the shim's row boundary is
    // proven lossless, not just spec-tested.
    "q_cdc_source" -> ((s, d) =>
      s.read.format("cdc").option("path", cdcQueryRoot(s, d)).load()
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("cnt"), dsum(col("s_acctbal")).as("total_bal"))
        .orderBy(col("s_nationkey"))),

    // C8b — TIME TRAVEL through the same snapshot: the state as of batch
    // 0 (the full insert load, before any update or delete applied) read
    // back via that batch's immutable manifest. The oracle is the plain
    // supplier aggregate — proof the later batches' rewrites did not
    // disturb the retained batch-0 manifest or the data dirs it
    // references.
    "q_cdc_timetravel" -> ((s, d) =>
      graft.streaming.CdcApply.readSnapshotAt(s, cdcQueryRoot(s, d), 0L).get
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("cnt"), dsum(col("s_acctbal")).as("total_bal"))
        .orderBy(col("s_nationkey"))),

    // C8c — TIMESTAMP time travel: "the table as of t=1500" resolves
    // through the manifests' commit timestamps (batch 0 committed at
    // t=1000, batch 1 at t=2000) to the batch-0 snapshot. Same oracle
    // shape as q_cdc_timetravel but exercising the timestamp→batch
    // resolution layer, with a distinguishing aggregate (max version
    // must be 1 everywhere — proof no batch-1 row leaked backward in
    // time).
    "q_cdc_asof" -> ((s, d) =>
      graft.streaming.CdcApply
        .readSnapshotAsOf(s, cdcQueryRoot(s, d), 1500L).get
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("cnt"), dsum(col("s_acctbal")).as("total_bal"),
          max(col("version")).as("max_version"))
        .orderBy(col("s_nationkey"))),

    // C8d — the flagship COMPOSITION under the hash gate: row/column
    // security over a continuously-merged CDC snapshot (reference
    // semantics: the data-cells filter IS the product,
    // main.tf:432-457). The snapshot root is registered as a governed
    // location and the Analyst gets a cells filter (row predicate
    // s_nationkey < 13, column allowlist INCLUDING the deleted column —
    // tombstone filtering runs above the injected projection, the
    // subtlety this query pins forever). The Analyst aggregate sees
    // only filtered rows, and `n_cols` witnesses the projection: the
    // 4-column allowlist minus the stripped deleted column = 3 visible
    // columns — an ungoverned read would surface all 8 and
    // hash-mismatch. Behavioral edges (admin full view, anonymous
    // denied, write denial) stay in CdcGovernanceSpec.
    "q_cdc_governed" -> ((s, d) => {
      import graft.governance.{Analyst, DataCellsFilter, Governance,
        GovernanceCatalog}
      val root = cdcGovRoot(s, d)
      GovernanceCatalog.registerLocation(root, "graft_cdc",
        "supplier_snap")
      GovernanceCatalog.register(Analyst, "graft_cdc", DataCellsFilter(
        "analyst-cdc-supplier", "supplier_snap", "s_nationkey < 13",
        Seq("s_suppkey", "s_nationkey", "s_acctbal", "deleted")))
      Governance.withPrincipal(s, Analyst) {
        val snap = graft.streaming.CdcApply.readSnapshot(s, root).get
        snap.groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("cnt"),
            dsum(col("s_acctbal")).as("total_bal"))
          .withColumn("n_cols", lit(snap.columns.length.toLong))
          .orderBy(col("s_nationkey"))
      }
    }),

    // C8p — the SQL-NAME surface under the hash gate: the identical net
    // state as q_cdc_merge, read back through `spark.sql` over a
    // REGISTERED identifier rather than the Scala API (reference
    // posture: every query is a SQL string handed to an engine,
    // validate.sh:74-80, outputs.tf:57-97). The CdcTableResolution rule
    // expands the name to the CURRENT snapshot at analysis time — a
    // stale captured view (registration-time manifest) would miss
    // batch 1 and hash-mismatch against the net-state oracle.
    "q_sql_cdc" -> ((s, d) => {
      val root = cdcQueryRoot(s, d)
      // registration lives only for the eager analysis of this one
      // statement (the rule expands the name at analysis time);
      // unregistering keeps the engine-global registry from leaking
      // bench names into later sessions' SHOW TABLES
      graft.streaming.CdcSql.registerTable(s, root, "supplier_cdc")
      try s.sql("SELECT s_nationkey, COUNT(*) AS cnt, " +
        "CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) " +
        "AS total_bal " +
        "FROM supplier_cdc GROUP BY s_nationkey ORDER BY s_nationkey")
      finally graft.streaming.CdcSql.unregisterTable("supplier_cdc")
    }),

    // C8i — SQL-ONLY INGEST: batch 1 of the supplier change stream
    // enters through the cdc_apply procedure from a temp view — no
    // Scala applyBatch, no df.write — with an EXPLICIT batch id so
    // re-runs replay through the guard as no-ops (the artifact root
    // persists across rounds). The net state then reads back through
    // the registered name against the same oracle as q_sql_cdc: a
    // batch lost, double-applied, or merged under the wrong manifest
    // contract would hash-mismatch.
    "q_sql_cdc_apply" -> ((s, d) => {
      val root = synchronized {
        val r = new java.io.File("target/graft-data/cdc_sqlapply_q/" +
          graft.sources.Artifacts.datasetKey(d, s"$d/supplier.parquet") +
          s"_$CdcRecipeRev").getAbsolutePath
        val (b0, b1) = supplierCdcBatches(s, d)
        graft.streaming.CdcApply.applyBatch(b0, 0L, r, Seq("s_suppkey"),
          "version", Some("deleted"), commitTs = Some(1000L))
        graft.streaming.CdcSql.registerTable(s, r, "supplier_sql_apply")
        b1.createOrReplaceTempView("supplier_sql_apply_src")
        s.sql("SELECT * FROM cdc_apply('supplier_sql_apply', " +
          "'supplier_sql_apply_src', 1)").collect()
        r
      }
      try s.sql("SELECT s_nationkey, COUNT(*) AS cnt, " +
        "CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) " +
        "AS total_bal FROM supplier_sql_apply " +
        "GROUP BY s_nationkey ORDER BY s_nationkey")
      finally graft.streaming.CdcSql.unregisterTable("supplier_sql_apply")
    }),

    // C8q — SQL TIME TRAVEL via the standard syntax: `VERSION AS OF 0`
    // over the registered name resolves through the retained batch-0
    // manifest (readSnapshotAt), so the result is the pre-update insert
    // load — batch 1's +100 upserts or tombstones bleeding in would
    // hash-mismatch the plain-supplier oracle.
    // C8t — NAMED TAG time travel from SQL (Iceberg-style read ref):
    // batch 0 tagged 'stable' through the gated cdc_tag procedure,
    // then read via VERSION AS OF 'stable' — resolving through the
    // tag file, against the same batch-0 oracle as q_cdc_timetravel.
    // Tag creation is guarded for idempotent re-runs (the tag
    // persists in the artifact root; a blind re-create refuses).
    "q_sql_cdc_tagged" -> ((s, d) => {
      val root = synchronized { supplierCdcRoot(s, d, "cdc_tag_q") }
      graft.streaming.CdcSql.registerTable(s, root, "supplier_tagged")
      try {
        if (graft.streaming.CdcApply.resolveTag(s, root, "stable").isEmpty)
          s.sql("SELECT * FROM cdc_tag('supplier_tagged', 'stable', 0)")
            .collect()
        s.sql("SELECT s_nationkey, COUNT(*) AS cnt, " +
          "CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) " +
          "AS total_bal " +
          "FROM supplier_tagged VERSION AS OF 'stable' " +
          "GROUP BY s_nationkey ORDER BY s_nationkey")
      } finally graft.streaming.CdcSql.unregisterTable("supplier_tagged")
    }),

    "q_sql_cdc_timetravel" -> ((s, d) => {
      val root = cdcQueryRoot(s, d)
      graft.streaming.CdcSql.registerTable(s, root, "supplier_cdc")
      try s.sql("SELECT s_nationkey, COUNT(*) AS cnt, " +
        "CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) " +
        "AS total_bal " +
        "FROM supplier_cdc VERSION AS OF 0 " +
        "GROUP BY s_nationkey ORDER BY s_nationkey")
      finally graft.streaming.CdcSql.unregisterTable("supplier_cdc")
    }),

    // C8r — the change feed from SQL: the registered feed materialized
    // as a temp view (CdcSql.changesView — the one SQL entry point that
    // captures at creation rather than re-resolving; streaming
    // consumers tail readChangesStream) and re-read through spark.sql
    // against the same first-principles oracle as q_cdc_changes.
    "q_sql_cdc_changes" -> ((s, d) => {
      val root = cdcChangesRoot(s, d)
      graft.streaming.CdcSql.registerTable(s, root, "supplier_cdc_feed")
      try {
        val v = graft.streaming.CdcSql
          .changesView(s, "supplier_cdc_feed", 0L)
        s.sql(s"SELECT s_suppkey, s_nationkey, s_acctbal, version, " +
          s"deleted, `_change_batch` AS change_batch FROM $v " +
          "ORDER BY s_suppkey")
      } finally graft.streaming.CdcSql
        .unregisterTable("supplier_cdc_feed")
    }),

    // C8g — INCREMENTAL CHANGE FEED under the hash gate: "every row
    // changed since batch 0" — the downstream-sync primitive — served
    // from stored batch stamps with manifest-level pruning of buckets
    // untouched since then (no snapshot diff, no log replay). The
    // oracle derives the same change set from first principles: %5
    // keys upserted with +100 (version 2), %7 keys tombstoned at
    // their original balance (version 3, delete-wins over the %35
    // overlap), everything stamped by the batch that applied it.
    // Tombstones are IN the feed (a sync consumer must see deletes) —
    // the one declared query where flagged deletes surface as rows.
    "q_cdc_changes" -> ((s, d) =>
      graft.streaming.CdcApply
        .changesSince(s, cdcChangesRoot(s, d), 0L).get
        .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"),
          col("version"), col("deleted"),
          col("_change_batch").as("change_batch"))
        .orderBy(col("s_suppkey"))),

    // C8o — BOUNDED DIFF under the hash gate: changesBetween(-1, 0) on
    // the SAME table whose head is already at batch 1 — the feed runs
    // against batch 0's RETAINED manifest, so the result is exactly
    // the batch-0 insert load (every supplier at version 1, stamped 0)
    // with none of batch 1's updates or tombstones bleeding in. A feed
    // that consulted the current manifest instead of the historical
    // one would carry batch-1 stamps and hash-mismatch.
    "q_cdc_diff" -> ((s, d) =>
      graft.streaming.CdcApply
        .changesBetween(s, cdcChangesRoot(s, d), -1L, 0L).get
        .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"),
          col("version"), col("deleted"),
          col("_change_batch").as("change_batch"))
        .orderBy(col("s_suppkey"))),

    // C8h — REPLICATION under the hash gate: the aggregate runs on a
    // MIRROR built purely from the change feed (seed sync = changes
    // since -1 applied as one batch), against the same net-state
    // oracle as q_cdc_merge — any key the sync dropped, duplicated, or
    // failed to delete hash-mismatches, and `wm` witnesses that the
    // mirror's replay-guard watermark reached the source's head.
    // C8x — DELTA-PROTOCOL EXPORT: the supplier snapshot published as
    // a spec-conformant Delta table (_delta_log JSON + plain parquet)
    // and read back through the engine's own protocol reader — the
    // interop seam validated end to end without a delta library.
    // The INCREMENTAL exporter is the declared path: it republishes
    // only buckets whose physical identity changed (O(changed
    // buckets) per sync — the 100 TB shape) and commits NOTHING when
    // the table hasn't moved, so re-runs add no versions; the
    // aggregate over the Delta read hash-checks against the same
    // net-state oracle as the snapshot itself.
    "q_delta_export" -> ((s, d) => {
      val root = cdcQueryRoot(s, d)
      val delta = new java.io.File(
        "target/graft-data/delta_export_inc_q/" +
        graft.sources.Artifacts.datasetKey(d, s"$d/supplier.parquet") +
        s"_$CdcRecipeRev").getAbsolutePath
      synchronized {
        graft.sources.DeltaInterop.exportIncremental(s, root, delta)
      }
      graft.sources.DeltaInterop.readDelta(s, delta)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("cnt"),
          dsum(col("s_acctbal")).as("total_bal"))
        .orderBy(col("s_nationkey"))
    }),

    "q_cdc_mirror" -> ((s, d) => {
      val root = cdcMirrorRoot(s, d)
      val wm = graft.streaming.CdcApply.currentVersion(s, root).get
      graft.streaming.CdcApply.readSnapshot(s, root).get
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("cnt"),
          dsum(col("s_acctbal")).as("total_bal"))
        .withColumn("wm", lit(wm))
        .orderBy(col("s_nationkey"))
    }),

    // C8f — ADDITIVE SCHEMA EVOLUTION under the hash gate (spec-proven
    // since round 9, now oracle-pinned): batch 1 introduces `s_bonus`
    // mid-stream on keys ≡0 (mod 3); the merged read declares the
    // evolved manifest schema, so every pre-evolution row surfaces
    // NULL bonus — summed through coalesce, any row that wrongly
    // carries (or drops) the evolved column hash-mismatches. The bonus
    // is exact-integer valued, so the oracle has no floating-point
    // rounding hazard.
    "q_cdc_schema_evo" -> ((s, d) =>
      graft.streaming.CdcApply
        .readSnapshot(s, cdcSchemaEvoRoot(s, d)).get
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("cnt"),
          dsum(col("s_acctbal")).as("total_bal"),
          sum(coalesce(col("s_bonus"), lit(0L))).as("total_bonus"))
        .orderBy(col("s_nationkey"))),

    // C8e — bucket-count evolution under the hash gate: the same
    // two-batch change stream rebucketed 16 → 5, then aggregated FROM
    // THE REBUCKETED snapshot against the q_cdc_merge net-state oracle —
    // a row lost, duplicated, or mutated by the layout rewrite
    // hash-mismatches, and `n_buckets` (manifest-authoritative conf)
    // witnesses that the rewrite actually committed. Stream
    // continuation across the rewrite stays in EventStreamSpec.
    "q_rebucket" -> ((s, d) => {
      val root = cdcRebucketRoot(s, d)
      val nb = graft.streaming.CdcApply.numBuckets(s, root).get
      graft.streaming.CdcApply.readSnapshot(s, root).get
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("cnt"),
          dsum(col("s_acctbal")).as("total_bal"))
        .withColumn("n_buckets", lit(nb.toLong))
        .orderBy(col("s_nationkey"))
    }),

    // C8j — INCREMENTAL MATERIALIZED AGGREGATE under the hash gate:
    // the rollup table holds one partial-aggregate row per (source
    // bucket, nation), maintained by two syncs interleaved with the
    // two source batches — the second sync recomputed ONLY the buckets
    // batch 1 rewrote, every other partial carried forward by the
    // rollup's manifest. The query re-aggregates the partials; the
    // oracle computes the same aggregate directly from the net state,
    // so a stale carried partial, an undeleted vanished group, or a
    // wrong partial-combine hash-mismatches. `wm` witnesses the rollup
    // watermark reached the source head. max_bal exercises an
    // aggregate that is only exact under deletes BECAUSE touched
    // buckets recompute (no decrement exists for max).
    "q_cdc_rollup" -> ((s, d) => {
      val roll = cdcRollupRoot(s, d)
      val wm = graft.streaming.CdcApply.currentVersion(s, roll).get
      graft.streaming.Rollup
        .readRollup(s, roll, Seq("s_nationkey"), rollupAggs).get
        .withColumn("total_bal", col("total_bal").cast("double"))
        .withColumn("wm", lit(wm))
        .orderBy(col("s_nationkey"))
    }),

    // C8k — REPLICATION CHAIN under the hash gate: a mirror of the
    // mirror, synced from the first mirror's OWN change feed (stamps
    // written by a sync, not an original apply) — the "the mirror is a
    // full CDC table" claim as a checked result rather than prose.
    // Same net-state oracle as q_cdc_merge; `wm` witnesses the chain
    // watermark reached the head through both hops.
    "q_cdc_chain" -> ((s, d) => {
      val root = cdcChainRoot(s, d)
      val wm = graft.streaming.CdcApply.currentVersion(s, root).get
      graft.streaming.CdcApply.readSnapshot(s, root).get
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("cnt"),
          dsum(col("s_acctbal")).as("total_bal"))
        .withColumn("wm", lit(wm))
        .orderBy(col("s_nationkey"))
    }),

    // C8i — POINT LOOKUP under the hash gate: primary-key GETs against
    // the merged snapshot — an untouched key (1, version 1), an
    // updated key (5: +100 at version 2), a tombstoned key (7: reads
    // back empty, like every snapshot read), and a never-present key
    // (whose bucket may be absent: a zero-filesystem typed empty
    // frame) — unioned into one deterministic result against the
    // q_cdc_merge net-state oracle restricted to those keys. Each
    // lookup scans at most ONE bucket directory (plan-asserted in
    // EventStreamSpec); this row pins the VALUES the pruned read
    // returns, closing the one r11 read path without a CORRECTNESS
    // entry.
    "q_lookup" -> ((s, d) => {
      val root = cdcQueryRoot(s, d)
      Seq(1L, 5L, 7L, 999999999L)
        .map(k => graft.streaming.CdcApply.lookup(s, root, Seq(k)).get
          .select(col("s_suppkey"), col("s_nationkey"),
            col("s_acctbal"), col("version")))
        .reduce(_.unionByName(_))
        .orderBy(col("s_suppkey"))
    }),

    // C8n — SECONDARY-INDEX LOOKUP under the hash gate: "every live
    // supplier of nations 1 and 3" answered through the incrementally-
    // synced s_nationkey index — one index bucket probe per nation,
    // then only the source buckets holding matches, semi-joined on the
    // primary key (plan-asserted in SecondaryIndexSpec). The oracle
    // recomputes the same rows from the net state, so an index entry
    // the second sync failed to tombstone (a deleted %7 supplier) or
    // a missed batch-1 update hash-mismatches. `wm` witnesses the
    // index watermark reached the source head.
    "q_lookup_by" -> ((s, d) => {
      val (src, idx) = cdcIndexRoots(s, d)
      val wm = graft.streaming.CdcApply.currentVersion(s, idx).get
      Seq(1, 3)
        .map(n => graft.streaming.SecondaryIndex
          .lookupBy(s, src, idx, Seq(n)).get
          .select(col("s_suppkey"), col("s_nationkey"),
            col("s_acctbal"), col("version")))
        .reduce(_.unionByName(_))
        .withColumn("wm", lit(wm))
        .orderBy(col("s_suppkey"))
    }),

    // C8l — MERGE-ON-READ under the hash gate: the same two-batch
    // change stream under the delta layout (maxDeltas = 4), read while
    // batch 1's deltas are still PENDING — the snapshot resolves
    // per-key latest-wins across base + delta directories at read
    // time. Same net-state oracle as q_cdc_merge: a resolution that
    // kept a superseded row, dropped a winner, or leaked a tombstone
    // hash-mismatches. `has_deltas` witnesses (from manifest metadata
    // alone) that the read really crossed pending deltas rather than
    // an eagerly-merged table.
    "q_cdc_mor" -> ((s, d) => {
      val root = cdcMorRoot(s, d)
      val pend = graft.streaming.CdcApply.buckets(s, root)
        .agg(sum(col("pending_deltas"))).head().getLong(0)
      graft.streaming.CdcApply.readSnapshot(s, root).get
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("cnt"),
          dsum(col("s_acctbal")).as("total_bal"))
        .withColumn("has_deltas", lit(if (pend > 0) 1L else 0L))
        .orderBy(col("s_nationkey"))
    }),

    // C8m — COMPACTION under the hash gate: the same merge-on-read
    // stream, then compactBuckets folds every pending delta back into
    // single base directories as a maintenance generation. The content
    // must be byte-identical to the resolved read (same oracle), and
    // `pending` witnesses from the manifest that zero deltas remain —
    // the compacted table is back on the zero-resolution fast path.
    "q_cdc_compact" -> ((s, d) => {
      val root = cdcCompactRoot(s, d)
      val pend = graft.streaming.CdcApply.buckets(s, root)
        .agg(sum(col("pending_deltas"))).head().getLong(0)
      graft.streaming.CdcApply.readSnapshot(s, root).get
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("cnt"),
          dsum(col("s_acctbal")).as("total_bal"))
        .withColumn("pending", lit(pend))
        .orderBy(col("s_nationkey"))
    }),

    // C8m — WRITE-TIME QUALITY GATE under the hash gate: the supplier
    // stream routed through Quality.applyChecked (acctbal_nonneg +
    // name_present, NULL fails closed, deletes bypass). The snapshot
    // is "the latest ADMITTED version per key" — a key whose update
    // was quarantined KEEPS serving its older clean version, the
    // subtlety that distinguishes a write-time gate from a read-time
    // filter, and exactly what the oracle's latest-admitted window
    // reconstructs. Deletes (which bypass the gate) must still land.
    "q_quality_gate" -> ((s, d) => {
      val (main, _) = cdcGateRoots(s, d)
      graft.streaming.CdcApply.readSnapshot(s, main).get
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("cnt"),
          dsum(col("s_acctbal")).as("total_bal"))
        .orderBy(col("s_nationkey"))
    }),

    // C8n — the gate's other half: the QUARANTINE table is a full CDC
    // table whose snapshot is "the latest REJECTED version per key",
    // each row carrying the comma-joined name-sorted reasons it
    // failed. Hash-checking reasons + versions proves the gate
    // quarantined exactly the violating row versions with exactly the
    // right attribution (a NULL-name corruption must read
    // 'name_present', a negative post-update balance
    // 'acctbal_nonneg', a row failing both must list both).
    "q_quarantine" -> ((s, d) => {
      val (_, quar) = cdcGateRoots(s, d)
      graft.streaming.CdcApply.readSnapshot(s, quar).get
        .select(col("s_suppkey"), col("version"),
          col(graft.streaming.Quality.ViolatedCol).as("violated"))
        .orderBy(col("s_suppkey"))
    }),

    // C1d — INCREMENTAL NEAR-DUP DEDUP under the hash gate: batch 1
    // deduped against a persisted MinHash signature index of the
    // corpus — verbatim re-ingests AND lightly-edited (" v2") copies
    // both drop (exact shingle-Jaccard >= 0.5 to a prior keeper,
    // verified only for banding candidates), while genuinely fresh
    // synthetic docs survive. The " v2" arm is what distinguishes this
    // from q_dedup_incremental: the exact index admits an edit, the
    // near-dup index catches it. Oracle: exhaustive NOT EXISTS
    // anti-join over exact Jaccard between the reconstructed batch and
    // the full corpus — hash-matching it proves the banded probe
    // missed no true pair at this scale.
    "q_neardup_incremental" -> ((s, d) => {
      val root = new java.io.File("target/graft-data/neardup_incr_q/" +
        graft.sources.Artifacts.datasetKey(d, s"$d/documents.parquet") +
        "_rev1").getAbsolutePath
      synchronized {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        Dedup.incrementalNearDup(docs, docs, root, "doc_id", "text", 0L,
          maxDeltas = 4)
        Dedup.incrementalNearDup(nearDupBatch1(s, d), docs, root,
          "doc_id", "text", 1L, maxDeltas = 4)
          .orderBy(col("doc_id"))
      }
    }),

    // C1c — INCREMENTAL CORPUS DEDUP under the hash gate: batch 1
    // (verbatim re-ingests + edited copies, both reconstructible in
    // SQL) deduped against a PERSISTED index built from batch 0 —
    // the continuous-ingest form of exact dedup, no corpus rescan. The
    // index is a merge-on-read CDC table (O(batch) writes — the right
    // mode for a trickle-fed 100 TB index); survivors are read back
    // from the index's own change feed, so the declared result is the
    // index's testimony of what batch 1 admitted: every re-ingested
    // hash dropped (first-wins across batches via the CDC tie rules),
    // every edited doc admitted under its smallest batch id. The
    // oracle recomputes the survivor set with an anti-semi-join over
    // the reconstructed batches.
    "q_dedup_incremental" -> ((s, d) => {
      val root = new java.io.File("target/graft-data/dedup_incr_q/" +
        graft.sources.Artifacts.datasetKey(d, s"$d/documents.parquet") +
        "_rev1").getAbsolutePath
      synchronized {
        val (b0, b1) = incrDedupBatches(s, d)
        Dedup.incrementalExact(b0, root, "doc_id", "text", 0L,
          maxDeltas = 4)
        Dedup.incrementalExact(b1, root, "doc_id", "text", 1L,
          maxDeltas = 4)
          .orderBy(col("doc_id"))
      }
    }),

    // C13 — BM25 keyword search against the PERSISTED inverted index
    // (postings partitioned by term → the scan prunes to the three query
    // terms' directories; df + corpus stats broadcast; top-k is
    // TakeOrdered). Rational-idf scoring (see [[Bm25]]) keeps every
    // arithmetic op a correctly-rounded IEEE double op over exact
    // integer inputs, so DuckDB reproduces the scores bit-for-bit —
    // a fully oracle-checked retrieval pipeline. 'dup' is rare
    // (df≈25/500) vs the common terms (df≈390), so the ranking
    // genuinely exercises the idf weighting.
    "q_bm25_topk" -> ((s, d) => {
      val idxRoot = new java.io.File("target/graft-data/bm25_index/" +
        graft.sources.Artifacts.datasetKey(d, s"$d/documents.parquet"))
        .getAbsolutePath
      val (post, stats) = Bm25.persistedIndex(
        Tables.documents(s, d), "doc_id", "text", idxRoot)
      Bm25.search(post, stats, Seq("vector", "join", "dup"), topK = 15)
    }),

    // C13b — INCREMENTAL search index under the hash gate: two
    // document batches (the corpus, then SQL-reconstructible extras
    // that shift the rare term's df) ingested into the CDC-backed
    // inverted index — postings bucketed BY TERM (the probe reads only
    // the query terms' bucket families via scanByBucketValues), corpus
    // stats served from an incrementally-maintained rollup. The oracle
    // recomputes rational-idf BM25 over the UNION corpus, so a posting
    // lost or duplicated across batches, a stale stats partial, or a
    // broken bucket probe all hash-mismatch. Idempotent across runs:
    // replayed applies and syncs no-op on their replay guards.
    "q_bm25_incremental" -> ((s, d) => {
      val root = new java.io.File("target/graft-data/bm25_incr/" +
        graft.sources.Artifacts.datasetKey(d, s"$d/documents.parquet") +
        "_rev1").getAbsolutePath
      synchronized {
        val docs = Tables.documents(s, d).select(col("doc_id"),
          col("text"))
        val extra = docs.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"),
            concat(col("text"), lit(" dup dup")).as("text"))
        Bm25.incrementalIndex(docs, root, "doc_id", "text", 0L)
        Bm25.incrementalIndex(extra, root, "doc_id", "text", 1L)
        Bm25.searchIncremental(s, root,
          Seq("vector", "join", "dup"), topK = 15)
      }
    }),

    // C14 — column-level data profiling (the Glue-crawler/table-stats
    // analog, reference main.tf:291-300): one aggregation pass emits
    // per-column rows/nulls/exact-distinct/min/max in long format. The
    // nullif() input derives a genuinely NULL-bearing column so the
    // null accounting is exercised; min/max compare on the NATIVE type
    // before the uniform string cast.
    "q_profile" -> ((s, d) =>
      Profile.profile(
        Tables.customer(s, d).select(col("c_custkey"),
          col("c_nationkey").cast(LongType).as("c_nationkey"),
          nullif(col("c_mktsegment"), lit("BUILDING")).as("segment")),
        Seq("c_custkey", "c_nationkey", "segment"))),

    // C15 — cross-source contamination matrix: pairwise distinct-shingle
    // Jaccard between corpus sources (Ngrams.groupOverlap). The
    // intersection join is keyed on the SHINGLE — a shared shingle
    // costs O(sources²) rows for that shingle only, never an all-pairs
    // document comparison; set sizes broadcast. All counts exact
    // BIGINTs, the one division per output row — oracle-exact.
    // STAGED path (the scale configuration): the per-source shingle
    // set feeds three plan subtrees, so it materializes once.
    "q_corpus_overlap" -> ((s, d) =>
      graft.search.Ngrams.groupOverlap(
        Tables.documents(s, d), "source", "text",
        stagingDir = Some("target/graft-data/overlap_staging/" +
          graft.sources.Artifacts.datasetKey(d, s"$d/documents.parquet")))
        .orderBy(col("group_a"), col("group_b"))),

    // C16 — n-gram commonness scoring (the exact-count flavor of
    // n-gram-LM document scoring): each document's mean corpus
    // document-frequency over its distinct shingles. High mean_df =
    // boilerplate/stereotyped text; ~1 = novel. Exact integer sums
    // (order-independent), one division per row. Two shingle-keyed
    // shuffles; text never shuffles.
    "q_ngram_commonness" -> ((s, d) =>
      graft.search.Ngrams.commonness(
        Tables.documents(s, d), "doc_id", "text",
        stagingDir = Some("target/graft-data/ngram_staging/" +
          graft.sources.Artifacts.datasetKey(d, s"$d/documents.parquet")))
        .orderBy(col("doc_id"))),

    // C16c — learned linear quality scorer, closed-form: per-language
    // fit of token count ~ char length + alpha-char count from exact
    // integer moments (Regression.fitTwoFeature — one pass, ten longs
    // per group on the shuffle, Cramer solve as a shared-SQL fixed
    // expression tree, R² included). The trainable flavor of
    // q_quality_score's hand weights.
    "q_quality_regression" -> ((s, d) =>
      graft.operators.Regression.fitTwoFeature(
        Tables.documents(s, d), Seq("lang"),
        length(col("text")),
        length(regexp_replace(col("text"), "[^A-Za-z]", "")),
        T.tokenCount(col("text")))
        .orderBy(col("lang"))),

    // C16b — cross-document repeated spans (Lee et al. 2022): 10-token
    // windows appearing in ≥2 distinct docs, most-repeated first. The
    // count pass shuffles 16-byte fingerprints, never text; only
    // survivors' text materializes (Ngrams.repeatedSpans).
    "q_repeated_spans" -> ((s, d) =>
      graft.search.Ngrams.repeatedSpans(
        Tables.documents(s, d), "doc_id", "text")),

    // C17 — hybrid retrieval: BM25 keyword run + exact-cosine embedding
    // run fused by Reciprocal Rank Fusion (Fusion.rrf; vec_id aligns
    // with doc_id in the embeddings sidecar table). Both runs are
    // index-pruned top-k (tiny); ranking and fusion touch ≤ k rows.
    // Ranks are total-order integers and each reciprocal is one IEEE
    // division, so the fused scores are bit-identical in the oracle's
    // mirrored expression tree.
    "q_hybrid_search" -> ((s, d) => {
      val idxRoot = new java.io.File("target/graft-data/bm25_index/" +
        graft.sources.Artifacts.datasetKey(d, s"$d/documents.parquet"))
        .getAbsolutePath
      val (post, stats) = Bm25.persistedIndex(
        Tables.documents(s, d), "doc_id", "text", idxRoot)
      val kw = Bm25.search(post, stats, Seq("vector", "join", "dup"),
        topK = 15)
      val vec = Ann.bruteForceTopK(Tables.embeddings(s, d), "vec_id",
        "embedding", queryId = 0L, k = 10)
        .select(col("vec_id").as("doc_id"), col("sim"))
      graft.search.Fusion.rrf(
        Seq(("kw", kw, "score"), ("vec", vec, "sim")), "doc_id")
    }),

    // rows-only: product-quantization ANN (Jégou et al. 2011), the
    // candidate-stage-plus-refinement shape PQ is deployed in at
    // 100 TB: the persisted index is m=16 codebook ids per vector
    // (16 bytes at int8 width vs 256 for the raw floats) plus a
    // 256-row codebook; the ADC pass scores codes against a broadcast
    // lookup table touching NO raw vector, surfaces 64 candidates,
    // and only those 64 raw vectors are fetched (semi-join pruned)
    // for the exact re-rank. Approximate by construction → no oracle;
    // refined recall vs bruteForceTopK pinned in AnnSpec (~0.9 here),
    // like q_ann_kmeans.
    "q_ann_pq" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val path = new java.io.File("target/graft-data/pq_index/" +
        graft.sources.Artifacts.datasetKey(d, s"$d/embeddings.parquet"))
        .getAbsolutePath
      val (books, codes) = Ann.persistedPqIndex(emb, "vec_id",
        "embedding", dims = 64, m = 16, ksub = 16, iters = 3, path)
      Ann.pqRefinedTopK(emb, codes, books, "vec_id", "embedding",
        dims = 64, m = 16, queryId = 0L, k = 10, nCandidates = 64)
    }),

    // C14b — IVF+PQ composed (the deployed billion-scale IVFADC
    // shape): coarse quantizer prunes to nprobe lists, ADC scores only
    // those lists' codes (the codes table is PARTITIONED BY LIST —
    // probe pruning is a plan-time PartitionFilters entry, asserted in
    // AnnSpec), exact refine of the 64 survivors. Rows-only like
    // q_ann_pq — two compounded approximation stages; the recall twin
    // against bruteForceTopK is machine-checked in AnnSpec.
    "q_ann_ivfpq" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val path = new java.io.File("target/graft-data/ivfpq_index/" +
        graft.sources.Artifacts.datasetKey(d, s"$d/embeddings.parquet"))
        .getAbsolutePath
      val (cents, books, codes) = Ann.persistedIvfPqIndex(emb, "vec_id",
        "embedding", dims = 64, m = 16, ksub = 16, iters = 3,
        nlists = 8, path)
      Ann.ivfPqRefinedTopK(emb, codes, books, cents, "vec_id",
        "embedding", dims = 64, m = 16, queryId = 0L, k = 10,
        nprobe = 4, nCandidates = 64)
    }),

    // C15 — SemDeDup semantic dedup: within-cluster (label) cosine
    // >= 0.25 drops the higher id; survivors hash-checked. The
    // quadratic comparison is confined per cluster (the paper's move),
    // the similarity is the codegen'd integer-quantized CosineQuant
    // (bit-identical in DuckDB — same contract as q_embed_topk), and
    // the keep rule is the deterministic lowest-id witness, so the
    // full dedup decision — clustering pruning included — is in the
    // hash, not just the pair counts.
    "q_semantic_dedup" -> ((s, d) =>
      Ann.semanticDedup(Tables.embeddings(s, d), "vec_id", "embedding",
        "label", 0.25)
        .select(col("vec_id"), col("label").cast(LongType).as("label"))
        .orderBy(col("vec_id")))
  )

  /** The two document batches behind `q_dedup_incremental`, both pure
    * functions of the `documents` table so DuckDB reconstructs them
    * exactly: batch 0 is the corpus as-is; batch 1 re-ingests every
    * doc_id % 5 == 0 document VERBATIM under a new id (must be dropped
    * by the index) and ships an EDITED copy (` v2` suffix) of every
    * doc_id % 5 == 1 document (genuinely new content — must survive).
    */
  private def incrDedupBatches(s: SparkSession, d: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val reingested = docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val edited = docs.filter(col("doc_id") % 5 === 1)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" v2")).as("text"))
    (docs, reingested.unionByName(edited))
  }

  /** Batch 1 behind `q_neardup_incremental` — a pure function of the
    * `documents` table (DuckDB reconstructs it): verbatim re-ingests
    * (% 5 == 0, J = 1 to their source → drop), edited copies
    * (% 5 == 1, ` v2` suffix, J ≈ 0.95+ → drop: the case exact dedup
    * misses), and synthetic fresh docs (% 5 == 2, no shingle overlap
    * with any corpus doc → survive).
    */
  private def nearDupBatch1(s: SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val reingested = docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val edited = docs.filter(col("doc_id") % 5 === 1)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" v2")).as("text"))
    val fresh = docs.filter(col("doc_id") % 5 === 2)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(lit("fresh synthetic doc "), col("doc_id").cast("string"),
          lit(" alpha beta gamma delta epsilon zeta")).as("text"))
    reingested.unionByName(edited).unionByName(fresh)
  }

  private val quantSql =
    "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"

  /** SQL twin of TextFunctions.qualityScore (non-empty text). */
  private val qualitySql: String =
    "(0.6 * (CAST(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) " +
      "AS DOUBLE) / CAST(LENGTH(text) AS DOUBLE)) + 0.4 * (1.0 - " +
      "CAST(LENGTH(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) " +
      "AS DOUBLE) / CAST(LENGTH(text) AS DOUBLE)))"

  /** Gaps-and-islands sessionization, the SQL twin of session_window with
    * a 30-minute gap: a session breaks only when the inter-event gap
    * STRICTLY exceeds 30 minutes (session_window merges adjacent [t,t+g]
    * intervals, so an exactly-gap-length pause stays in-session).
    */
  private val sessionOracle: String =
    "WITH x AS (SELECT user_id, ts, value, CASE WHEN " +
      "LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL OR " +
      "ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) > " +
      "INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess FROM events), " +
      "y AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id " +
      "ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM x) " +
      "SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events, " +
      "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value " +
      "FROM y GROUP BY user_id, sid ORDER BY user_id, session_start"

  /** DuckDB twin of `array_distinct(TextFunctions.shingles(text, 3))`:
    * whitespace tokens → 3-gram shingles (whole text when under 3 tokens),
    * deduplicated. Used by the exhaustive all-pairs Jaccard oracles.
    */
  /** Shingle CTE over an arbitrary (doc_id, text) relation — the SQL
    * twin of `array_distinct(shingles(text, 3))`, parameterized so the
    * incremental oracle can shingle a CONSTRUCTED batch exactly like
    * the corpus.
    */
  private def shingleCteFor(name: String, rel: String): String =
    s"$name AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) < 3 " +
      "THEN [array_to_string(toks, ' ')] " +
      "ELSE list_transform(range(1, len(toks)-1), " +
      "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END) AS s " +
      "FROM (SELECT doc_id, list_filter(regexp_split_to_array(trim(text), " +
      s"'\\s+'), t -> t <> '') AS toks FROM $rel))"

  private val shingleCte: String = shingleCteFor("sh", "documents")

  private val jaccardExpr: String =
    "CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / " +
      "len(list_distinct(a.s || b.s))"

  /** Thresholded exact-Jaccard duplicate pairs, computed EXHAUSTIVELY
    * (all doc pairs) — the ground truth the LSH-pruned Spark pipeline
    * must reproduce.
    */
  private val dupPairsSql: String =
    "SELECT a.doc_id AS id_a, b.doc_id AS id_b, " + jaccardExpr +
      " AS jaccard FROM sh a JOIN sh b ON a.doc_id < b.doc_id " +
      "WHERE " + jaccardExpr + " >= 0.5"

  /** DuckDB twin of TextFunctions.langId: per-profile stopword-overlap
    * scores as (score, lang) structs, argmax via list_max's lexicographic
    * struct ordering — generated from the SAME langProfiles the Spark
    * side uses, so the two can never drift.
    */
  private val langIdStructs: String =
    T.langProfiles.map { case (lang, words) =>
      "{'score': len(list_intersect(toks, [" +
        words.map(w => s"'$w'").mkString(",") + s"])), 'lang': '$lang'}"
    }.mkString(", ")

  /** DuckDB twin of the IVF path (Ann.centroids + ivfTopK): quantized-
    * mean centroids per label, probe = top-nprobe labels by quantized
    * cosine to the query vector, then exact quantized-cosine top-k within
    * the probed lists. Every accumulation is exact-integer, so the result
    * is bit-identical to the Spark pipeline.
    */
  private def cosSql(dot: String, na: String, nb: String): String =
    s"CASE WHEN $na = 0 OR $nb = 0 THEN NULL ELSE CAST($dot AS DOUBLE) / " +
      s"(sqrt(CAST($na AS DOUBLE)) * sqrt(CAST($nb AS DOUBLE))) END"

  private def quantOf(v: String): String =
    s"list_transform($v, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) " +
      "AS BIGINT))"

  /** The IVF oracle parameterized over the SEARCHED relation: the
    * centroid/probe CTEs always run over the BASE `embeddings` table
    * (the coarse quantizer is fixed — retrained offline, the standard
    * IVF posture the incremental index mirrors), while `searchRel`
    * is the corpus actually scanned within the probed lists —
    * `embeddings` for `q_ann_ivf`, the ingested union for
    * `q_ann_incremental`.
    */
  private def ivfOracleOver(searchRel: String): String =
    "WITH ce AS (SELECT label, u.i AS dim, " +
      "CAST(CAST(SUM(CAST(round(CAST(u.x AS DOUBLE) * 1000000) AS BIGINT))" +
      " AS DOUBLE) / (1000000.0 * COUNT(*)) AS REAL) AS cx " +
      "FROM (SELECT label, unnest(list_transform(embedding, " +
      "(x,i) -> {'x': x, 'i': i})) AS u FROM embeddings) " +
      "GROUP BY label, u.i), " +
      "cent AS (SELECT label, list(cx ORDER BY dim) AS centroid " +
      "FROM ce GROUP BY label), " +
      "q AS (SELECT " + quantOf("embedding") + " AS qv FROM embeddings " +
      "WHERE vec_id = 0), " +
      "cq AS (SELECT label, " +
      "list_sum(list_transform(list_zip(" + quantOf("centroid") +
      ", qv), p -> p[1] * p[2])) AS dot, " +
      "list_sum(list_transform(" + quantOf("centroid") +
      ", x -> x*x)) AS na, " +
      "list_sum(list_transform(qv, x -> x*x)) AS nb FROM cent, q), " +
      "probe AS (SELECT label FROM (SELECT label, " +
      cosSql("dot", "na", "nb") + " AS sim FROM cq) " +
      "ORDER BY sim DESC, label LIMIT 3), " +
      "e AS (SELECT vec_id, " + quantOf("embedding") + " AS ev " +
      s"FROM $searchRel WHERE vec_id <> 0 " +
      "AND label IN (SELECT label FROM probe)), " +
      "s AS (SELECT vec_id, " +
      "list_sum(list_transform(list_zip(ev, qv), p -> p[1] * p[2])) " +
      "AS dot, list_sum(list_transform(ev, x -> x*x)) AS na, " +
      "list_sum(list_transform(qv, x -> x*x)) AS nb FROM e, q) " +
      "SELECT vec_id, " + cosSql("dot", "na", "nb") + " AS sim FROM s " +
      "ORDER BY sim DESC, vec_id LIMIT 10"

  private val ivfOracle: String = ivfOracleOver("embeddings")

  /** SQL-reconstructible second embedding batch for the incremental
    * index oracle: every vec_id % 7 == 0 vector re-ingested at a
    * shifted id (same list label, same components — the duplicate
    * ranks identically and the id tiebreak orders original first).
    */
  private val annIncrUnionRel: String =
    "(SELECT vec_id, label, embedding FROM embeddings " +
      "UNION ALL SELECT vec_id + 1000000 AS vec_id, label, embedding " +
      "FROM embeddings WHERE vec_id % 7 = 0 AND vec_id <> 0)"

  /** BM25 CTE chain + final select, factored so the hybrid-search
    * oracle composes the SAME text the q_bm25_topk oracle runs (one
    * definition — the two can never drift). Mirrors Bm25.search's
    * expression tree op for op (same parenthesization → identical
    * correctly-rounded doubles).
    */
  private val bm25Ctes: String =
    "lens AS (SELECT doc_id, CAST(len(list_filter(" +
      "regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) " +
      "AS BIGINT) AS len FROM documents), " +
      "stats AS (SELECT COUNT(*) AS n_docs, SUM(len) AS sum_len " +
      "FROM lens), " +
      "tok AS (SELECT doc_id, unnest(list_filter(" +
      "regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) " +
      "AS term FROM documents), " +
      "tf AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf " +
      "FROM tok WHERE term IN ('vector', 'join', 'dup') " +
      "GROUP BY doc_id, term), " +
      "dft AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df " +
      "FROM tf GROUP BY term), " +
      "sc AS (SELECT t.doc_id, t.term, " +
      "((CAST(st.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5)) * " +
      "(t.tf * 2.2) / (t.tf + 1.2 * (0.25 + 0.75 * " +
      "(CAST(l.len AS DOUBLE) / (CAST(st.sum_len AS DOUBLE) / " +
      "CAST(st.n_docs AS DOUBLE))))) AS s " +
      "FROM tf t JOIN dft d USING (term) JOIN lens l USING (doc_id) " +
      "CROSS JOIN stats st), " +
      "piv AS (SELECT doc_id, " +
      "max(CASE WHEN term = 'vector' THEN s END) AS s0, " +
      "max(CASE WHEN term = 'join' THEN s END) AS s1, " +
      "max(CASE WHEN term = 'dup' THEN s END) AS s2 " +
      "FROM sc GROUP BY doc_id)"

  private val bm25Select: String =
    "SELECT doc_id, ((COALESCE(s0, 0.0) + COALESCE(s1, 0.0)) + " +
      "COALESCE(s2, 0.0)) AS score " +
      "FROM piv ORDER BY score DESC, doc_id LIMIT 15"

  /** Exact-cosine top-k CTEs + final select, factored for the same
    * reason (shared by q_embed_topk and the hybrid oracle).
    */
  private val embedCtes: String =
    "q AS (SELECT " + quantSql + " AS qv FROM embeddings " +
      "WHERE vec_id = 0), " +
      "e AS (SELECT vec_id, " + quantSql + " AS ev FROM embeddings " +
      "WHERE vec_id <> 0), " +
      "s AS (SELECT vec_id, " +
      "CAST(list_sum(list_transform(list_zip(ev, qv), " +
      "p -> p[1] * p[2])) AS BIGINT) AS dotq, " +
      "CAST(list_sum(list_transform(ev, x -> x * x)) AS BIGINT) AS na, " +
      "CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS nb " +
      "FROM e, q)"

  private val embedSelect: String =
    "SELECT vec_id, CAST(dotq AS DOUBLE) / " +
      "(sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS sim " +
      "FROM s ORDER BY sim DESC, vec_id LIMIT 10"

  /** DuckDB twin of the per-group distinct shingle SET — `(g, sh)`
    * rows over an arbitrary grouping column, for the overlap and
    * commonness oracles.
    */
  private def groupShingleCte(groupCol: String): String =
    s"gsh AS (SELECT DISTINCT $groupCol AS g, unnest(s) AS sh FROM " +
      "(SELECT " + groupCol + ", CASE WHEN len(toks) < 3 " +
      "THEN [array_to_string(toks, ' ')] " +
      "ELSE list_transform(range(1, len(toks)-1), " +
      "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END AS s " +
      "FROM (SELECT " + groupCol + ", " +
      "list_filter(regexp_split_to_array(trim(text), '\\s+'), " +
      "t -> t <> '') AS toks FROM documents)))"

  val oracles: Map[String, String] = Map(
    "q_jsonl_sink" ->
      ("SELECT lang, COUNT(*) AS n_docs, " +
        "CAST(SUM(n_chars) AS BIGINT) AS total_chars FROM documents " +
        "WHERE doc_id < 100 GROUP BY lang ORDER BY lang"),
    "q_interval_join" ->
      ("WITH p AS (SELECT event_id, user_id, ts FROM events " +
        "WHERE event_type = 'purchase' AND event_id < 3000), " +
        "v AS (SELECT user_id AS v_user, ts AS v_ts, value AS v_value " +
        "FROM events WHERE event_type = 'view') " +
        "SELECT p.event_id, p.user_id, p.ts, " +
        "COUNT(v.v_ts) AS n_views_1h, " +
        "CAST(SUM(CAST(v.v_value AS DECIMAL(18,2))) AS DOUBLE) " +
        "AS view_value_1h FROM p LEFT JOIN v " +
        "ON p.user_id = v.v_user " +
        "AND v.v_ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts " +
        "GROUP BY p.event_id, p.user_id, p.ts ORDER BY p.event_id"),
    "q_tfidf_topk" ->
      ("WITH t AS (SELECT doc_id, unnest(list_filter(" +
        "regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) " +
        "AS term FROM documents WHERE doc_id < 200), " +
        "tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t " +
        "GROUP BY doc_id, term), " +
        "df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term), " +
        "sc AS (SELECT doc_id, term, tf, df, " +
        "CAST(tf * 200 AS DOUBLE) / df AS score " +
        "FROM tf JOIN df USING (term)), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY doc_id " +
        "ORDER BY score DESC, term) AS rn FROM sc) " +
        "SELECT doc_id, term, tf, df, score FROM r WHERE rn <= 3 " +
        "ORDER BY doc_id, score DESC, term"),
    "q_lang_id" ->
      ("WITH t AS (SELECT lang, list_filter(regexp_split_to_array(" +
        "trim(text), '\\s+'), x -> x <> '') AS toks FROM documents), " +
        "p AS (SELECT lang, list_max([" + langIdStructs + "]).lang " +
        "AS pred_lang FROM t) " +
        "SELECT lang, pred_lang, COUNT(*) AS cnt FROM p " +
        "GROUP BY lang, pred_lang ORDER BY lang, pred_lang"),
    "q_ann_ivf" -> ivfOracle,
    // exhaustive IVF over the union corpus; centroids/probe from base
    "q_ann_incremental" -> ivfOracleOver(annIncrUnionRel),
    "q_ngram_jaccard" ->
      ("WITH " + shingleCte + " " + dupPairsSql + " ORDER BY id_a, id_b"),
    "q_dedup_clusters" ->
      ("WITH RECURSIVE " + shingleCte + ", " +
        "pairs AS (" + dupPairsSql + "), " +
        "edges AS (SELECT id_a AS src, id_b AS dst FROM pairs " +
        "UNION SELECT id_b, id_a FROM pairs), " +
        "reach(src, dst) AS (SELECT src, dst FROM edges UNION " +
        "SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src), " +
        "comp AS (SELECT src AS doc_id, least(src, MIN(dst)) AS cluster_id " +
        "FROM reach GROUP BY src) " +
        "SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id, " +
        "d.doc_id = COALESCE(c.cluster_id, d.doc_id) AS is_keeper " +
        "FROM documents d LEFT JOIN comp c USING (doc_id) " +
        "ORDER BY d.doc_id"),
    "q_dedup_exact" ->
      ("SELECT sha256(text) AS content_hash, MIN(doc_id) AS doc_id, " +
        "COUNT(*) AS n_copies FROM documents GROUP BY sha256(text) " +
        "ORDER BY doc_id"),
    "q_text_stats" ->
      ("SELECT lang, COUNT(*) AS n_docs, " +
        "CAST(SUM(n_chars) AS BIGINT) AS total_chars, " +
        "CAST(SUM(len(list_filter(regexp_split_to_array(trim(text), " +
        "'\\s+'), t -> t <> ''))) AS BIGINT) " +
        "AS total_tokens, MIN(n_chars) AS min_chars, " +
        "MAX(n_chars) AS max_chars, " +
        "CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars " +
        "FROM documents GROUP BY lang ORDER BY lang"),
    "q_token_count" ->
      ("SELECT doc_id, " +
        "CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'), " +
        "t -> t <> '')) AS BIGINT) AS ws_tokens, " +
        "CAST(len(regexp_extract_all(text, " +
        "'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS sub_tokens " +
        "FROM documents WHERE doc_id < 500 ORDER BY doc_id"),
    "q_jaccard_simjoin" ->
      ("WITH d AS (SELECT doc_id, list_distinct(list_filter(" +
        "regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) " +
        "AS toks FROM documents WHERE doc_id < 400) " +
        "SELECT id_a, id_b, inter, uni, " +
        "CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) AS jaccard " +
        "FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS inter, " +
        "CAST(len(a.toks) + len(b.toks) - " +
        "len(list_intersect(a.toks, b.toks)) AS BIGINT) AS uni " +
        "FROM d a, d b WHERE a.doc_id < b.doc_id) " +
        "WHERE CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) >= 0.4 " +
        "ORDER BY id_a, id_b"),
    "q_edit_simjoin" ->
      ("SELECT a.c_custkey AS id_a, b.c_custkey AS id_b, " +
        "CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist " +
        "FROM customer a, customer b " +
        "WHERE a.c_custkey < b.c_custkey AND a.c_custkey <= 2000 " +
        "AND b.c_custkey <= 2000 " +
        "AND levenshtein(a.c_name, b.c_name) <= 1 " +
        "ORDER BY id_a, id_b"),
    "q_weighted_sample" ->
      ("SELECT doc_id, w, u / w AS priority FROM (SELECT doc_id, " +
        "CAST(len(list_filter(regexp_split_to_array(trim(text), " +
        "'\\s+'), t -> t <> '')) AS BIGINT) AS w, " +
        "(CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE) + 0.5) " +
        "/ 4294967296.0 AS u FROM documents) " +
        "ORDER BY priority, doc_id LIMIT 50"),
    "q_length_histogram" ->
      ("SELECT CAST(FLOOR(len(list_filter(regexp_split_to_array(" +
        "trim(text), '\\s+'), t -> t <> '')) / 16) * 16 AS BIGINT) AS " +
        "bucket, COUNT(*) AS n_docs FROM documents GROUP BY bucket " +
        "ORDER BY bucket"),
    "q_quality_score" ->
      ("SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS char_len, " +
        "CAST(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)" +
        " / CAST(LENGTH(text) AS DOUBLE) AS alpha_ratio, " +
        "CASE WHEN LENGTH(text) = 0 THEN 0.0 ELSE " +
        "0.6 * (CAST(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) " +
        "AS DOUBLE) / CAST(LENGTH(text) AS DOUBLE)) + 0.4 * (1.0 - " +
        "CAST(LENGTH(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) " +
        "AS DOUBLE) / CAST(LENGTH(text) AS DOUBLE)) END AS quality " +
        "FROM documents WHERE doc_id < 500 ORDER BY doc_id"),
    // the regex patterns interpolate from TextFunctions so the oracle can
    // never drift from the engine's scrubber (SQL string literals pass
    // backslashes through untouched; both engines speak the RE2 subset)
    "q_pii_scrub" ->
      ("WITH t AS (SELECT lang, " +
        "substr(text, 1, 40) || ' reach user' || " +
        "CAST(doc_id AS VARCHAR) || '@example.com id ' || " +
        "lpad(CAST(doc_id * 7 % 1000 AS VARCHAR), 3, '0') || '-' || " +
        "lpad(CAST(doc_id * 13 % 100 AS VARCHAR), 2, '0') || '-' || " +
        "lpad(CAST(doc_id * 31 % 10000 AS VARCHAR), 4, '0') || ' end' " +
        "AS planted FROM documents), " +
        "u AS (SELECT lang, planted, " +
        s"regexp_replace(regexp_replace(planted, '${T.emailPattern}', " +
        s"'<EMAIL>', 'g'), '${T.ssnPattern}', '<ID>', 'g') AS scrubbed " +
        "FROM t) " +
        "SELECT lang, COUNT(*) AS n_docs, " +
        "CAST(SUM(LENGTH(planted)) AS BIGINT) AS raw_chars, " +
        "CAST(SUM(LENGTH(scrubbed)) AS BIGINT) AS scrubbed_chars, " +
        "CAST(SUM(LENGTH(scrubbed) - LENGTH(regexp_replace(scrubbed, " +
        "'<EMAIL>', '', 'g'))) AS BIGINT) AS email_mark_chars, " +
        "CAST(SUM(LENGTH(scrubbed) - LENGTH(regexp_replace(scrubbed, " +
        "'<ID>', '', 'g'))) AS BIGINT) AS id_mark_chars " +
        "FROM u GROUP BY lang ORDER BY lang"),
    "q_embed_topk" -> ("WITH " + embedCtes + " " + embedSelect),
    "q_stream_window" ->
      ("SELECT date_trunc('hour', ts) AS hour_ts, event_type, " +
        "COUNT(*) AS cnt, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value " +
        "FROM events GROUP BY 1, 2 ORDER BY hour_ts, event_type"),
    "q_approx_distinct" ->
      ("SELECT event_type, COUNT(DISTINCT user_id) AS n_users, " +
        "COUNT(*) AS cnt FROM events GROUP BY event_type " +
        "ORDER BY event_type"),
    "q_json_extract" ->
      ("SELECT event_id, event_type, " +
        "CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val " +
        "FROM events WHERE event_id < 500 ORDER BY event_id"),
    "q_vocab_topk" ->
      ("SELECT u.word AS word, COUNT(*) AS cnt FROM (SELECT " +
        "unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'), " +
        "t -> t <> '')) AS word FROM documents) u " +
        "GROUP BY u.word ORDER BY cnt DESC, word LIMIT 50"),
    "q_quality_filter" ->
      ("SELECT doc_id, lang, " +
        "CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+')," +
        " t -> t <> '')) AS BIGINT) AS n_tokens, " +
        qualitySql + " AS quality FROM documents " +
        "WHERE lang = 'en' AND " + qualitySql + " > 0.75 AND " +
        "len(list_filter(regexp_split_to_array(trim(text), '\\s+'), " +
        "t -> t <> '')) BETWEEN 20 AND 60 ORDER BY doc_id"),
    "q_pipeline_tokens" ->
      ("WITH keepers AS (SELECT MIN(doc_id) AS doc_id FROM documents " +
        "GROUP BY sha256(text)) " +
        "SELECT COUNT(*) AS n_docs, " +
        "CAST(SUM(len(list_filter(regexp_split_to_array(trim(text), " +
        "'\\s+'), t -> t <> ''))) AS BIGINT) AS surviving_tokens " +
        "FROM documents JOIN keepers USING (doc_id) WHERE " +
        qualitySql + " > 0.7"),
    "q_orc_sink" ->
      ("SELECT lang, COUNT(*) AS n_docs, " +
        "CAST(SUM(n_chars) AS BIGINT) AS total_chars FROM documents " +
        "WHERE doc_id < 100 GROUP BY lang ORDER BY lang"),
    "q_data_mixture" ->
      ("SELECT lang, COUNT(*) AS kept_docs, " +
        "CAST(SUM(len(list_filter(regexp_split_to_array(trim(text), " +
        "'\\s+'), t -> t <> ''))) AS BIGINT) AS kept_tokens " +
        "FROM documents WHERE doc_id % 100 < " +
        "CASE WHEN lang = 'en' THEN 60 WHEN lang = 'zh' THEN 40 " +
        "ELSE 20 END GROUP BY lang ORDER BY lang"),
    "q_train_shuffle" ->
      (s"SELECT doc_id, ${scrambleSql("doc_id")} " +
        "AS shuffle_key FROM documents " +
        "ORDER BY shuffle_key, doc_id LIMIT 100"),
    "q_train_split" ->
      (s"WITH t AS (SELECT lang, CASE " +
        s"WHEN (${scrambleSql("doc_id")}) % 100 < 80 THEN 'train' " +
        s"WHEN (${scrambleSql("doc_id")}) % 100 < 90 THEN 'val' " +
        "ELSE 'test' END AS split, " +
        "len(list_filter(regexp_split_to_array(trim(text), '\\s+'), " +
        "x -> x <> '')) AS tok FROM documents) " +
        "SELECT lang, split, COUNT(*) AS n_docs, " +
        "CAST(SUM(tok) AS BIGINT) AS tokens FROM t " +
        "GROUP BY lang, split ORDER BY lang, split"),
    "q_compacted" ->
      ("SELECT event_type, COUNT(*) AS cnt, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) " +
        "AS total_value FROM events " +
        "GROUP BY event_type ORDER BY event_type"),
    "q_zorder" ->
      ("SELECT event_type, COUNT(*) AS cnt, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) " +
        "AS total_value, COUNT(DISTINCT user_id) AS n_users " +
        "FROM events WHERE value >= 0 AND value <= 30 " +
        "GROUP BY event_type ORDER BY event_type"),
    "q_group_sample" ->
      (s"WITH t AS (SELECT lang, doc_id, " +
        s"${scrambleSql("doc_id")} AS sk FROM documents), " +
        "r AS (SELECT lang, doc_id, ROW_NUMBER() OVER " +
        "(PARTITION BY lang ORDER BY sk, doc_id) AS rk FROM t) " +
        "SELECT lang, doc_id, rk FROM r WHERE rk <= 50 " +
        "ORDER BY lang, rk"),
    "q_pack_sequences" ->
      (s"WITH t AS (SELECT doc_id, ${scrambleSql("doc_id")} AS sk, " +
        "len(list_filter(regexp_split_to_array(trim(text), '\\s+'), " +
        "x -> x <> '')) AS tok FROM documents WHERE doc_id < 2000), " +
        "c AS (SELECT tok, COALESCE(SUM(tok) OVER (ORDER BY sk, doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) " +
        "AS strt FROM t) " +
        "SELECT CAST(strt // 512 AS BIGINT) AS bin_id, " +
        "COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS bin_tokens " +
        "FROM c GROUP BY 1 ORDER BY bin_id LIMIT 50"),
    "q_doc_chunks" ->
      ("WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array(" +
        "trim(text), '\\s+'), x -> x <> '') AS toks FROM documents " +
        "WHERE doc_id < 300), " +
        "c AS (SELECT doc_id, unnest(list_transform(" +
        "range(0, CAST(ceil(len(toks) / 32.0) AS BIGINT)), " +
        "i -> struct_pack(idx := i, " +
        "txt := array_to_string(list_slice(toks, i*32 + 1, i*32 + 32), " +
        "' '), n := least(32, len(toks) - i*32)))) AS ch FROM t) " +
        "SELECT doc_id, ch.idx AS chunk_idx, ch.txt AS chunk_text, " +
        "CAST(ch.n AS BIGINT) AS chunk_tokens FROM c " +
        "ORDER BY doc_id, chunk_idx"),
    "q_decontaminate" ->
      ("WITH " + shingleCte + ", " +
        "ev AS (SELECT DISTINCT unnest(s) AS shingle FROM sh " +
        "WHERE doc_id < 10), " +
        "c AS (SELECT doc_id, unnest(s) AS shingle FROM sh " +
        "WHERE doc_id >= 10) " +
        "SELECT c.doc_id, COUNT(*) AS n_overlap, " +
        "COUNT(*) >= 5 AS contaminated " +
        "FROM c JOIN ev USING (shingle) GROUP BY c.doc_id " +
        "ORDER BY c.doc_id"),
    "q_repetition_filter" ->
      ("WITH bg AS (SELECT doc_id, CASE WHEN len(toks) < 2 " +
        "THEN [array_to_string(toks, ' ')] " +
        "ELSE list_transform(range(1, len(toks)), " +
        "i -> toks[i] || ' ' || toks[i+1]) END AS b " +
        "FROM (SELECT doc_id, list_filter(regexp_split_to_array(" +
        "trim(text), '\\s+'), t -> t <> '') AS toks FROM documents " +
        "WHERE doc_id < 500)) " +
        "SELECT doc_id, CAST(len(b) AS BIGINT) AS n_bigrams, " +
        "CAST(len(list_distinct(b)) AS BIGINT) AS n_distinct, " +
        "CAST(len(b) - len(list_distinct(b)) AS DOUBLE) / len(b) " +
        "AS dup_frac, " +
        "(CAST(len(b) - len(list_distinct(b)) AS DOUBLE) / len(b)) " +
        "<= 0.2 AS keep FROM bg ORDER BY doc_id"),
    "q_sessionize" -> sessionOracle,
    "q_sessionize_typed" -> sessionOracle,
    "q_dpp_join" ->
      ("SELECT CAST(ts AS DATE) AS event_date, event_type, " +
        "COUNT(*) AS cnt, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value " +
        "FROM events WHERE day(CAST(ts AS DATE)) % 7 = 3 " +
        "GROUP BY 1, 2 ORDER BY event_date, event_type"),
    "q_partition_prune" ->
      ("SELECT event_type, COUNT(*) AS cnt, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value " +
        "FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-15' " +
        "GROUP BY event_type ORDER BY event_type"),
    "q_media_stats" ->
      ("SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' " +
        "ELSE 'video' END AS media_type, COUNT(*) AS n_media, " +
        "CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes, " +
        "CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes " +
        "FROM documents GROUP BY 1 ORDER BY media_type"),
    "q_media_video" ->
      ("SELECT doc_id AS media_id, " +
        "CAST(3 + doc_id % 6 AS INTEGER) AS n_frames, " +
        "CAST(8 + (doc_id // 11) % 17 AS INTEGER) AS width, " +
        "CAST(8 + (doc_id // 5) % 13 AS INTEGER) AS height " +
        "FROM documents WHERE doc_id % 3 = 2 AND doc_id < 400 " +
        "ORDER BY media_id"),
    "q_media_audio" ->
      ("SELECT doc_id AS media_id, CAST(8000 AS INTEGER) AS " +
        "sample_rate, CAST(200 + doc_id % 801 AS BIGINT) AS n_samples " +
        "FROM documents WHERE doc_id % 3 = 1 AND doc_id < 400 " +
        "ORDER BY media_id"),
    "q_cdc_merge" ->
      ("SELECT s_nationkey, COUNT(*) AS cnt, " +
        "CAST(SUM(CAST(CASE WHEN s_suppkey % 5 = 0 THEN s_acctbal + 100 " +
        "ELSE s_acctbal END AS DECIMAL(18,2))) AS DOUBLE) AS total_bal " +
        "FROM supplier WHERE s_suppkey % 7 <> 0 " +
        "GROUP BY s_nationkey ORDER BY s_nationkey"),
    // format("cdc") read of the same snapshot: identical net state
    "q_cdc_source" ->
      ("SELECT s_nationkey, COUNT(*) AS cnt, " +
        "CAST(SUM(CAST(CASE WHEN s_suppkey % 5 = 0 THEN s_acctbal + 100 " +
        "ELSE s_acctbal END AS DECIMAL(18,2))) AS DOUBLE) AS total_bal " +
        "FROM supplier WHERE s_suppkey % 7 <> 0 " +
        "GROUP BY s_nationkey ORDER BY s_nationkey"),
    // SQL-name read of the same snapshot: identical net state
    "q_sql_cdc" ->
      ("SELECT s_nationkey, COUNT(*) AS cnt, " +
        "CAST(SUM(CAST(CASE WHEN s_suppkey % 5 = 0 THEN s_acctbal + 100 " +
        "ELSE s_acctbal END AS DECIMAL(18,2))) AS DOUBLE) AS total_bal " +
        "FROM supplier WHERE s_suppkey % 7 <> 0 " +
        "GROUP BY s_nationkey ORDER BY s_nationkey"),
    // SQL-only ingest lands the identical net state
    "q_sql_cdc_apply" ->
      ("SELECT s_nationkey, COUNT(*) AS cnt, " +
        "CAST(SUM(CAST(CASE WHEN s_suppkey % 5 = 0 THEN s_acctbal + 100 " +
        "ELSE s_acctbal END AS DECIMAL(18,2))) AS DOUBLE) AS total_bal " +
        "FROM supplier WHERE s_suppkey % 7 <> 0 " +
        "GROUP BY s_nationkey ORDER BY s_nationkey"),
    // VERSION AS OF 0 == the batch-0 insert load, balances untouched
    "q_sql_cdc_timetravel" ->
      ("SELECT s_nationkey, COUNT(*) AS cnt, " +
        "CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal " +
        "FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey"),
    // the batch-1 change set through the SQL view — same first
    // principles as q_cdc_changes
    "q_sql_cdc_changes" ->
      ("SELECT s_suppkey, s_nationkey, " +
        "CASE WHEN s_suppkey % 7 = 0 THEN s_acctbal " +
        "ELSE s_acctbal + 100 END AS s_acctbal, " +
        "CASE WHEN s_suppkey % 7 = 0 THEN CAST(3 AS BIGINT) " +
        "ELSE CAST(2 AS BIGINT) END AS version, " +
        "(s_suppkey % 7 = 0) AS deleted, " +
        "CAST(1 AS BIGINT) AS change_batch " +
        "FROM supplier WHERE s_suppkey % 5 = 0 OR s_suppkey % 7 = 0 " +
        "ORDER BY s_suppkey"),
    // batch-0 state: every supplier present, balances untouched
    "q_cdc_timetravel" ->
      ("SELECT s_nationkey, COUNT(*) AS cnt, " +
        "CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal " +
        "FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey"),
    // the tag resolves to batch 0 = the pristine full supplier load
    "q_sql_cdc_tagged" ->
      ("SELECT s_nationkey, COUNT(*) AS cnt, " +
        "CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal " +
        "FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey"),
    // as-of t=1500 == batch-0 state, and no row may carry version > 1
    "q_cdc_asof" ->
      ("SELECT s_nationkey, COUNT(*) AS cnt, " +
        "CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal, " +
        "CAST(1 AS BIGINT) AS max_version " +
        "FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey"),
    // the analyst's view of the net state: row filter applied, and
    // exactly 3 columns visible (4-col allowlist minus the stripped
    // deleted column)
    "q_cdc_governed" ->
      ("SELECT s_nationkey, COUNT(*) AS cnt, " +
        "CAST(SUM(CAST(CASE WHEN s_suppkey % 5 = 0 THEN s_acctbal + 100 " +
        "ELSE s_acctbal END AS DECIMAL(18,2))) AS DOUBLE) AS total_bal, " +
        "CAST(3 AS BIGINT) AS n_cols " +
        "FROM supplier WHERE s_suppkey % 7 <> 0 AND s_nationkey < 13 " +
        "GROUP BY s_nationkey ORDER BY s_nationkey"),
    // the mirror's live state == the source's net state, watermark at
    // the source's head batch (1)
    // the Delta export serves the identical net state
    "q_delta_export" ->
      ("SELECT s_nationkey, COUNT(*) AS cnt, " +
        "CAST(SUM(CAST(CASE WHEN s_suppkey % 5 = 0 THEN s_acctbal + 100 " +
        "ELSE s_acctbal END AS DECIMAL(18,2))) AS DOUBLE) AS total_bal " +
        "FROM supplier WHERE s_suppkey % 7 <> 0 " +
        "GROUP BY s_nationkey ORDER BY s_nationkey"),
    "q_cdc_mirror" ->
      ("SELECT s_nationkey, COUNT(*) AS cnt, " +
        "CAST(SUM(CAST(CASE WHEN s_suppkey % 5 = 0 THEN s_acctbal + 100 " +
        "ELSE s_acctbal END AS DECIMAL(18,2))) AS DOUBLE) AS total_bal, " +
        "CAST(1 AS BIGINT) AS wm " +
        "FROM supplier WHERE s_suppkey % 7 <> 0 " +
        "GROUP BY s_nationkey ORDER BY s_nationkey"),
    // the batch-1 change set from first principles: upserts +100 on %5
    // keys, tombstones at original balance on %7 keys (delete wins the
    // %35 overlap), all stamped batch 1
    "q_cdc_changes" ->
      ("SELECT s_suppkey, s_nationkey, " +
        "CASE WHEN s_suppkey % 7 = 0 THEN s_acctbal " +
        "ELSE s_acctbal + 100 END AS s_acctbal, " +
        "CASE WHEN s_suppkey % 7 = 0 THEN CAST(3 AS BIGINT) " +
        "ELSE CAST(2 AS BIGINT) END AS version, " +
        "(s_suppkey % 7 = 0) AS deleted, " +
        "CAST(1 AS BIGINT) AS change_batch " +
        "FROM supplier WHERE s_suppkey % 5 = 0 OR s_suppkey % 7 = 0 " +
        "ORDER BY s_suppkey"),
    // the batch-0 insert load from first principles: every supplier at
    // version 1, live, stamped batch 0 — batch 1's changes excluded by
    // the historical-manifest bound
    "q_cdc_diff" ->
      ("SELECT s_suppkey, s_nationkey, s_acctbal, " +
        "CAST(1 AS BIGINT) AS version, FALSE AS deleted, " +
        "CAST(0 AS BIGINT) AS change_batch " +
        "FROM supplier ORDER BY s_suppkey"),
    // whole-row upsert: batch-1 rows replace their batch-0 versions
    // (same s_acctbal), carrying the evolved column; everyone else
    // keeps NULL bonus
    "q_cdc_schema_evo" ->
      ("SELECT s_nationkey, COUNT(*) AS cnt, " +
        "CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal, " +
        "CAST(SUM(CASE WHEN s_suppkey % 3 = 0 THEN s_suppkey % 10 " +
        "ELSE 0 END) AS BIGINT) AS total_bonus " +
        "FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey"),
    // net state identical to q_cdc_merge — the layout rewrite moved
    // every row and lost none — under the evolved 5-bucket conf
    "q_rebucket" ->
      ("SELECT s_nationkey, COUNT(*) AS cnt, " +
        "CAST(SUM(CAST(CASE WHEN s_suppkey % 5 = 0 THEN s_acctbal + 100 " +
        "ELSE s_acctbal END AS DECIMAL(18,2))) AS DOUBLE) AS total_bal, " +
        "CAST(5 AS BIGINT) AS n_buckets " +
        "FROM supplier WHERE s_suppkey % 7 <> 0 " +
        "GROUP BY s_nationkey ORDER BY s_nationkey"),
    // the materialized rollup must equal the direct aggregate over the
    // net state (updates applied, deleted keys absent), watermark at
    // the source head (1)
    "q_cdc_rollup" ->
      ("SELECT s_nationkey, COUNT(*) AS cnt, " +
        "CAST(SUM(CAST(CASE WHEN s_suppkey % 5 = 0 THEN s_acctbal + 100 " +
        "ELSE s_acctbal END AS DECIMAL(18,2))) AS DOUBLE) AS total_bal, " +
        "MAX(CASE WHEN s_suppkey % 5 = 0 THEN s_acctbal + 100 " +
        "ELSE s_acctbal END) AS max_bal, " +
        "CAST(1 AS BIGINT) AS wm " +
        "FROM supplier WHERE s_suppkey % 7 <> 0 " +
        "GROUP BY s_nationkey ORDER BY s_nationkey"),
    // two replication hops land on the same net state, chain watermark
    // at the source head (1)
    "q_cdc_chain" ->
      ("SELECT s_nationkey, COUNT(*) AS cnt, " +
        "CAST(SUM(CAST(CASE WHEN s_suppkey % 5 = 0 THEN s_acctbal + 100 " +
        "ELSE s_acctbal END AS DECIMAL(18,2))) AS DOUBLE) AS total_bal, " +
        "CAST(1 AS BIGINT) AS wm " +
        "FROM supplier WHERE s_suppkey % 7 <> 0 " +
        "GROUP BY s_nationkey ORDER BY s_nationkey"),
    // point lookups of keys 1 (untouched), 5 (updated +100, version
    // 2), 7 (tombstoned — absent), 999999999 (never present — absent)
    "q_lookup" ->
      ("SELECT s_suppkey, s_nationkey, " +
        "CASE WHEN s_suppkey % 5 = 0 THEN s_acctbal + 100 " +
        "ELSE s_acctbal END AS s_acctbal, " +
        "CASE WHEN s_suppkey % 5 = 0 THEN CAST(2 AS BIGINT) " +
        "ELSE CAST(1 AS BIGINT) END AS version " +
        "FROM supplier WHERE s_suppkey IN (1, 5) ORDER BY s_suppkey"),
    // the index-served rows for nations 1 and 3 from first principles:
    // live net-state rows (deletes absent, %5 updates applied), index
    // watermark at the source head (1)
    "q_lookup_by" ->
      ("SELECT s_suppkey, s_nationkey, " +
        "CASE WHEN s_suppkey % 5 = 0 THEN s_acctbal + 100 " +
        "ELSE s_acctbal END AS s_acctbal, " +
        "CASE WHEN s_suppkey % 5 = 0 THEN CAST(2 AS BIGINT) " +
        "ELSE CAST(1 AS BIGINT) END AS version, " +
        "CAST(1 AS BIGINT) AS wm " +
        "FROM supplier WHERE s_suppkey % 7 <> 0 " +
        "AND s_nationkey IN (1, 3) ORDER BY s_suppkey"),
    // merge-on-read resolved state must equal the copy-on-write net
    // state; has_deltas = 1 witnesses the read crossed pending deltas
    "q_cdc_mor" ->
      ("SELECT s_nationkey, COUNT(*) AS cnt, " +
        "CAST(SUM(CAST(CASE WHEN s_suppkey % 5 = 0 THEN s_acctbal + 100 " +
        "ELSE s_acctbal END AS DECIMAL(18,2))) AS DOUBLE) AS total_bal, " +
        "CAST(1 AS BIGINT) AS has_deltas " +
        "FROM supplier WHERE s_suppkey % 7 <> 0 " +
        "GROUP BY s_nationkey ORDER BY s_nationkey"),
    // compaction preserves content exactly; pending = 0 witnesses every
    // delta folded back into a single base directory
    "q_cdc_compact" ->
      ("SELECT s_nationkey, COUNT(*) AS cnt, " +
        "CAST(SUM(CAST(CASE WHEN s_suppkey % 5 = 0 THEN s_acctbal + 100 " +
        "ELSE s_acctbal END AS DECIMAL(18,2))) AS DOUBLE) AS total_bal, " +
        "CAST(0 AS BIGINT) AS pending " +
        "FROM supplier WHERE s_suppkey % 7 <> 0 " +
        "GROUP BY s_nationkey ORDER BY s_nationkey"),
    // the gated table's net state: per key, the latest version that
    // PASSED the gate wins (v2 candidates carry bal-500 and the %4
    // NULL-name corruption; v1 candidates the raw row), then the %7
    // deletes — which bypass the gate — remove their keys
    "q_quality_gate" ->
      ("WITH cand AS (" +
        "SELECT s_suppkey, s_nationkey, s_name, s_acctbal, 1 AS version " +
        "FROM supplier " +
        "UNION ALL " +
        "SELECT s_suppkey, s_nationkey, " +
        "CASE WHEN s_suppkey % 4 = 0 THEN NULL ELSE s_name END AS s_name, " +
        "s_acctbal - 500.0 AS s_acctbal, 2 AS version " +
        "FROM supplier WHERE s_suppkey % 2 = 0), " +
        "adm AS (SELECT *, row_number() OVER (PARTITION BY s_suppkey " +
        "ORDER BY version DESC) AS rn FROM cand " +
        "WHERE s_acctbal >= 0 AND s_name IS NOT NULL " +
        "AND length(s_name) > 0) " +
        "SELECT s_nationkey, COUNT(*) AS cnt, " +
        "CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) " +
        "AS total_bal " +
        "FROM adm WHERE rn = 1 AND s_suppkey % 7 <> 0 " +
        "GROUP BY s_nationkey ORDER BY s_nationkey"),
    // the quarantine's net state: per key, the latest version that
    // FAILED the gate, with its comma-joined name-sorted reasons
    "q_quarantine" ->
      ("WITH cand AS (" +
        "SELECT s_suppkey, s_name, s_acctbal, 1 AS version " +
        "FROM supplier " +
        "UNION ALL " +
        "SELECT s_suppkey, " +
        "CASE WHEN s_suppkey % 4 = 0 THEN NULL ELSE s_name END AS s_name, " +
        "s_acctbal - 500.0 AS s_acctbal, 2 AS version " +
        "FROM supplier WHERE s_suppkey % 2 = 0), " +
        "rej AS (SELECT s_suppkey, version, " +
        "concat_ws(',', " +
        "CASE WHEN NOT(s_acctbal >= 0) THEN 'acctbal_nonneg' END, " +
        "CASE WHEN s_name IS NULL OR length(s_name) = 0 " +
        "THEN 'name_present' END) AS violated, " +
        "row_number() OVER (PARTITION BY s_suppkey " +
        "ORDER BY version DESC) AS rn FROM cand " +
        "WHERE NOT(s_acctbal >= 0 AND s_name IS NOT NULL " +
        "AND length(s_name) > 0)) " +
        "SELECT s_suppkey, CAST(version AS BIGINT) AS version, violated " +
        "FROM rej WHERE rn = 1 ORDER BY s_suppkey"),
    // batch-1 survivors of the incremental index: hashes never seen in
    // batch 0, keeping the smallest batch-1 id per hash — re-ingested
    // texts drop, edited (" v2") texts survive
    "q_dedup_incremental" ->
      ("WITH b1 AS (" +
        "SELECT doc_id + 1000000 AS doc_id, text FROM documents " +
        "WHERE doc_id % 5 = 0 " +
        "UNION ALL " +
        "SELECT doc_id + 1000000 AS doc_id, text || ' v2' AS text " +
        "FROM documents WHERE doc_id % 5 = 1) " +
        "SELECT sha256(text) AS content_hash, MIN(doc_id) AS doc_id " +
        "FROM b1 WHERE sha256(text) NOT IN " +
        "(SELECT sha256(text) FROM documents) " +
        "GROUP BY sha256(text) ORDER BY doc_id"),
    // batch-1 survivors of the near-dup index: docs with exact
    // shingle-Jaccard >= 0.5 to ANY corpus doc drop (re-ingests and
    // " v2" edits alike); fresh synthetic docs survive
    "q_neardup_incremental" ->
      ("WITH b1 AS (" +
        "SELECT doc_id + 1000000 AS doc_id, text FROM documents " +
        "WHERE doc_id % 5 = 0 " +
        "UNION ALL " +
        "SELECT doc_id + 1000000 AS doc_id, text || ' v2' AS text " +
        "FROM documents WHERE doc_id % 5 = 1 " +
        "UNION ALL " +
        "SELECT doc_id + 1000000 AS doc_id, 'fresh synthetic doc ' || " +
        "doc_id || ' alpha beta gamma delta epsilon zeta' AS text " +
        "FROM documents WHERE doc_id % 5 = 2), " +
        shingleCteFor("shb", "b1") + ", " + shingleCte + " " +
        "SELECT doc_id FROM shb WHERE doc_id NOT IN (" +
        "SELECT b.doc_id FROM shb b JOIN sh a ON " +
        "CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / " +
        "len(list_distinct(a.s || b.s)) >= 0.5) " +
        "ORDER BY doc_id"),

    "q_cdc_restore" ->
      ("SELECT s_suppkey, s_nationkey, s_acctbal, " +
        "CAST(1 AS BIGINT) AS version, CAST(2 AS BIGINT) AS head_batch " +
        "FROM supplier ORDER BY s_suppkey"),

    // net state with the +1000 nation-3 correction composed over the
    // batch-1 +100 update, same left-to-right order both engines
    "q_cdc_update" ->
      ("SELECT s_suppkey, s_nationkey, " +
        "CASE WHEN s_nationkey = 3 THEN " +
        "(CASE WHEN s_suppkey % 5 = 0 THEN s_acctbal + 100 " +
        "ELSE s_acctbal END) + 1000 " +
        "ELSE (CASE WHEN s_suppkey % 5 = 0 THEN s_acctbal + 100 " +
        "ELSE s_acctbal END) END AS s_acctbal, " +
        "CAST(2 AS BIGINT) AS head_batch " +
        "FROM supplier WHERE s_suppkey % 7 <> 0 ORDER BY s_suppkey"),

    // net state (batch-1 deletes %7, updates %5 +100) minus the
    // administratively-erased %3 keys; head advanced to 2
    "q_cdc_delete" ->
      ("SELECT s_suppkey, s_nationkey, " +
        "CASE WHEN s_suppkey % 5 = 0 THEN s_acctbal + 100 " +
        "ELSE s_acctbal END AS s_acctbal, " +
        "CAST(2 AS BIGINT) AS head_batch " +
        "FROM supplier WHERE s_suppkey % 7 <> 0 AND s_suppkey % 3 <> 0 " +
        "ORDER BY s_suppkey"),

    // q_bm25_topk's oracle over the UNION corpus the incremental
    // index ingested in two batches.
    "q_bm25_incremental" ->
      ("WITH corpus AS (SELECT doc_id, text FROM documents " +
        "UNION ALL SELECT doc_id + 2000000 AS doc_id, " +
        "text || ' dup dup' AS text FROM documents " +
        "WHERE doc_id % 7 = 0), " +
        "lens AS (SELECT doc_id, CAST(len(list_filter(" +
        "regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) " +
        "AS BIGINT) AS len FROM corpus), " +
        "stats AS (SELECT COUNT(*) AS n_docs, SUM(len) AS sum_len " +
        "FROM lens), " +
        "tok AS (SELECT doc_id, unnest(list_filter(" +
        "regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) " +
        "AS term FROM corpus), " +
        "tf AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf " +
        "FROM tok WHERE term IN ('vector', 'join', 'dup') " +
        "GROUP BY doc_id, term), " +
        "dft AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df " +
        "FROM tf GROUP BY term), " +
        "sc AS (SELECT t.doc_id, t.term, " +
        "((CAST(st.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5)) * " +
        "(t.tf * 2.2) / (t.tf + 1.2 * (0.25 + 0.75 * " +
        "(CAST(l.len AS DOUBLE) / (CAST(st.sum_len AS DOUBLE) / " +
        "CAST(st.n_docs AS DOUBLE))))) AS s " +
        "FROM tf t JOIN dft d USING (term) JOIN lens l USING (doc_id) " +
        "CROSS JOIN stats st), " +
        "piv AS (SELECT doc_id, " +
        "max(CASE WHEN term = 'vector' THEN s END) AS s0, " +
        "max(CASE WHEN term = 'join' THEN s END) AS s1, " +
        "max(CASE WHEN term = 'dup' THEN s END) AS s2 " +
        "FROM sc GROUP BY doc_id) " +
        "SELECT doc_id, ((COALESCE(s0, 0.0) + COALESCE(s1, 0.0)) + " +
        "COALESCE(s2, 0.0)) AS score " +
        "FROM piv ORDER BY score DESC, doc_id LIMIT 15"),

    // Mirrors Bm25.search's expression tree op for op (same
    // parenthesization → identical correctly-rounded doubles).
    "q_bm25_topk" -> ("WITH " + bm25Ctes + " " + bm25Select),

    // RRF over the two factored runs: dense total-order ranks
    // (score desc, id), one reciprocal per retrieved rank, fixed
    // kw-then-vec addition — the mirrored tree of Fusion.rrf.
    "q_hybrid_search" ->
      ("WITH " + bm25Ctes + ", " + embedCtes + ", " +
        "kw AS (" + bm25Select + "), " +
        "vec AS (" + embedSelect + "), " +
        "rk AS (SELECT doc_id, CAST(ROW_NUMBER() OVER " +
        "(ORDER BY score DESC, doc_id) AS BIGINT) AS rank_kw FROM kw), " +
        "rv AS (SELECT vec_id AS doc_id, CAST(ROW_NUMBER() OVER " +
        "(ORDER BY sim DESC, vec_id) AS BIGINT) AS rank_vec FROM vec), " +
        "f AS (SELECT COALESCE(rk.doc_id, rv.doc_id) AS doc_id, " +
        "rank_kw, rank_vec FROM rk FULL JOIN rv ON rk.doc_id = rv.doc_id) " +
        "SELECT doc_id, rank_kw, rank_vec, " +
        "((CASE WHEN rank_kw IS NOT NULL THEN " +
        "1.0 / (60.0 + CAST(rank_kw AS DOUBLE)) ELSE 0.0 END) + " +
        "(CASE WHEN rank_vec IS NOT NULL THEN " +
        "1.0 / (60.0 + CAST(rank_vec AS DOUBLE)) ELSE 0.0 END)) " +
        "AS rrf_score " +
        "FROM f ORDER BY rrf_score DESC, doc_id"),

    // per-source distinct shingle sets → shingle-keyed intersection
    // counts + set sizes; exact BIGINTs into one division
    "q_corpus_overlap" ->
      ("WITH " + groupShingleCte("source") + ", " +
        "sizes AS (SELECT g, COUNT(*) AS n FROM gsh GROUP BY g), " +
        "inter AS (SELECT a.g AS group_a, b.g AS group_b, " +
        "COUNT(*) AS n_common FROM gsh a JOIN gsh b " +
        "ON a.sh = b.sh AND a.g < b.g GROUP BY a.g, b.g) " +
        "SELECT group_a, group_b, n_common, " +
        "CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b, " +
        "CAST(n_common AS DOUBLE) / " +
        "CAST(sa.n + sb.n - n_common AS DOUBLE) AS jaccard " +
        "FROM inter JOIN sizes sa ON sa.g = group_a " +
        "JOIN sizes sb ON sb.g = group_b " +
        "ORDER BY group_a, group_b"),

    // per-doc distinct shingles joined to their corpus document
    // frequencies; exact integer sums, one division per row
    "q_ngram_commonness" ->
      ("WITH " + groupShingleCte("doc_id") + ", " +
        "dfq AS (SELECT sh, COUNT(*) AS df FROM gsh GROUP BY sh), " +
        "per AS (SELECT g AS doc_id, COUNT(*) AS n_shingles, " +
        "CAST(SUM(df) AS BIGINT) AS sum_df " +
        "FROM gsh JOIN dfq USING (sh) GROUP BY g) " +
        "SELECT doc_id, n_shingles, sum_df, " +
        "CAST(sum_df AS DOUBLE) / CAST(n_shingles AS DOUBLE) AS mean_df " +
        "FROM per ORDER BY doc_id"),

    // the coefficient expressions come verbatim from
    // Regression.coefExprs — the SAME strings Spark's expr() parses
    "q_quality_regression" ->
      (graft.operators.Regression.oracleSql(
        "SELECT lang, CAST(LENGTH(text) AS BIGINT) AS x1, " +
          "CAST(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) " +
          "AS BIGINT) AS x2, " +
          "CAST(len(list_filter(regexp_split_to_array(trim(text), " +
          "'\\s+'), t -> t <> '')) AS BIGINT) AS y FROM documents",
        Seq("lang")) + " ORDER BY lang"),

    // stride-1 10-token windows, per-doc distinct, cross-doc counts;
    // the fingerprint pass is invisible to the oracle (text-keyed here)
    "q_repeated_spans" ->
      ("WITH t AS (SELECT doc_id, list_filter(" +
        "regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') " +
        "AS toks FROM documents), " +
        "sp AS (SELECT DISTINCT doc_id, span FROM " +
        "(SELECT doc_id, unnest(list_transform(range(1, len(toks)-8), " +
        "i -> array_to_string(toks[i:i+9], ' '))) AS span " +
        "FROM t WHERE len(toks) >= 10)), " +
        "cnt AS (SELECT span, COUNT(*) AS n_docs FROM sp " +
        "GROUP BY span HAVING COUNT(*) >= 2) " +
        "SELECT span, n_docs FROM cnt " +
        "ORDER BY n_docs DESC, span LIMIT 25"),

    // the q_dedup_clusters closure + the shared scramble on CLUSTER id:
    // a per-split census (doc and cluster counts)
    "q_leakage_split" ->
      ("WITH RECURSIVE " + shingleCte + ", " +
        "pairs AS (" + dupPairsSql + "), " +
        "edges AS (SELECT id_a AS src, id_b AS dst FROM pairs " +
        "UNION SELECT id_b, id_a FROM pairs), " +
        "reach(src, dst) AS (SELECT src, dst FROM edges UNION " +
        "SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src), " +
        "comp AS (SELECT src AS doc_id, least(src, MIN(dst)) " +
        "AS cluster_id FROM reach GROUP BY src), " +
        "m AS (SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) " +
        "AS cluster_id FROM documents d LEFT JOIN comp c USING (doc_id)), " +
        s"sp AS (SELECT doc_id, cluster_id, CASE " +
        s"WHEN (${scrambleSql("cluster_id")}) % 100 < 80 THEN 'train' " +
        s"WHEN (${scrambleSql("cluster_id")}) % 100 < 90 THEN 'val' " +
        "ELSE 'test' END AS split FROM m) " +
        "SELECT split, COUNT(*) AS n_docs, " +
        "COUNT(DISTINCT cluster_id) AS n_clusters " +
        "FROM sp GROUP BY split ORDER BY split"),

    "q_profile" ->
      ("WITH src AS (SELECT c_custkey, " +
        "CAST(c_nationkey AS BIGINT) AS c_nationkey, " +
        "nullif(c_mktsegment, 'BUILDING') AS segment FROM customer), " +
        "p AS (SELECT 'c_custkey' AS col_name, COUNT(*) AS n_rows, " +
        "COUNT(c_custkey) AS n_nonnull, " +
        "COUNT(DISTINCT c_custkey) AS n_distinct, " +
        "CAST(MIN(c_custkey) AS VARCHAR) AS min_val, " +
        "CAST(MAX(c_custkey) AS VARCHAR) AS max_val FROM src " +
        "UNION ALL SELECT 'c_nationkey', COUNT(*), COUNT(c_nationkey), " +
        "COUNT(DISTINCT c_nationkey), CAST(MIN(c_nationkey) AS VARCHAR), " +
        "CAST(MAX(c_nationkey) AS VARCHAR) FROM src " +
        "UNION ALL SELECT 'segment', COUNT(*), COUNT(segment), " +
        "COUNT(DISTINCT segment), CAST(MIN(segment) AS VARCHAR), " +
        "CAST(MAX(segment) AS VARCHAR) FROM src) " +
        "SELECT col_name, n_rows, n_nonnull, n_distinct, min_val, " +
        "max_val FROM p ORDER BY col_name"),

    // Same quantized-cosine formulation as the q_embed_topk oracle.
    "q_semantic_dedup" ->
      ("WITH e AS (SELECT vec_id, label, " + quantSql + " AS v " +
        "FROM embeddings), " +
        "d AS (SELECT DISTINCT b.vec_id FROM e a JOIN e b " +
        "ON a.label = b.label AND a.vec_id < b.vec_id " +
        "AND CAST(list_sum(list_transform(list_zip(a.v, b.v), " +
        "p -> p[1] * p[2])) AS DOUBLE) / " +
        "(sqrt(CAST(list_sum(list_transform(a.v, x -> x * x)) " +
        "AS DOUBLE)) * " +
        "sqrt(CAST(list_sum(list_transform(b.v, x -> x * x)) " +
        "AS DOUBLE))) >= 0.25) " +
        "SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings " +
        "WHERE vec_id NOT IN (SELECT vec_id FROM d) ORDER BY vec_id")
  )
}
