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

import graft.queries.TierCHelpers._

/** Tier C — retrieval and similarity search (exact/IVF/kmeans/
  * PQ/IVF+PQ/incremental ANN, BM25 + incremental inverted index,
  * hybrid RRF fusion, and the corpus-curation n-gram scans). Split from the
  * single TierC file (r16, maintainability); assembled with its
  * siblings at the [[TierC]] edge — keys, bodies and oracles are
  * verbatim, so the declared-query surface is unchanged.
  */
private[queries] object TierCSearch {

  val queries: Map[String, TierC.Q] = Map(

    // C3 — exact cosine top-k similarity search (brute-force baseline;
    // integer-quantized dot → bit-identical ranking across engines).
    "q_embed_topk" -> ((s, d) =>
      Ann.bruteForceTopK(Tables.embeddings(s, d), "vec_id", "embedding",
        queryId = 0L, k = 10)),

    // Filtered vector search — the vector-DB staple (ANN under a
    // metadata predicate): the attribute filter restricts the SEARCHED
    // set before the top-k (pushed into the scan like any predicate),
    // while the query vector is captured from the full table (its own
    // label need not satisfy the filter — the bruteForceTopK contract).
    // The same composition applies to the IVF/PQ paths: filter the
    // probed lists' scan. Exact integer-quantized cosine, hash-checked.
    "q_ann_filtered" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Ann.bruteForceTopK(emb.filter(col("label") === 3),
        emb.filter(col("vec_id") === 0L).select(col("embedding")),
        "vec_id", "embedding", queryId = 0L, k = 10)
    }),

    // C3d — hard-negative mining for contrastive training: for each
    // anchor (vec_id < 20), the 5 most cosine-similar vectors of a
    // DIFFERENT label — the maximally-confusable other-class examples
    // a contrastive/reranker trainer pairs with each positive. Anchors
    // broadcast; the corpus scans once map-side (vectors never
    // shuffle); exact integer-quantized cosine → fully hash-checked
    // against the all-pairs DuckDB twin.
    "q_hard_negatives" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Ann.hardNegatives(emb, "vec_id", "label", "embedding",
        anchors = emb.filter(col("vec_id") < 20), k = 5)
        .orderBy(col("anchor_id"), col("sim").desc, col("neg_id"))
    }),

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
    })
  )

  val oracles: Map[String, String] = Map(
    "q_ann_ivf" -> ivfOracle,
    // exhaustive IVF over the union corpus; centroids/probe from base
    "q_ann_incremental" -> ivfOracleOver(annIncrUnionRel),
    "q_embed_topk" -> ("WITH " + embedCtes + " " + embedSelect),

    // the same quantized-cosine formulation as the embed oracle, over
    // the all-pairs anchor x other-label join
    "q_hard_negatives" ->
      ("WITH e AS (SELECT vec_id, label, " + quantSql + " AS v " +
        "FROM embeddings), " +
        "a AS (SELECT vec_id AS anchor_id, label AS anchor_label, " +
        "v AS av FROM e WHERE vec_id < 20), " +
        "s AS (SELECT anchor_id, e.vec_id AS neg_id, " +
        "CAST(list_sum(list_transform(list_zip(e.v, a.av), " +
        "p -> p[1] * p[2])) AS BIGINT) AS dotq, " +
        "CAST(list_sum(list_transform(e.v, x -> x * x)) AS BIGINT) " +
        "AS na, " +
        "CAST(list_sum(list_transform(a.av, x -> x * x)) AS BIGINT) " +
        "AS nb FROM e JOIN a ON e.label <> a.anchor_label " +
        "AND e.vec_id <> a.anchor_id), " +
        "c AS (SELECT anchor_id, neg_id, CAST(dotq AS DOUBLE) / " +
        "(sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS sim " +
        "FROM s), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY anchor_id " +
        "ORDER BY sim DESC, neg_id) AS rn FROM c) " +
        "SELECT anchor_id, neg_id, sim FROM r WHERE rn <= 5 " +
        "ORDER BY anchor_id, sim DESC, neg_id"),

    "q_ann_filtered" ->
      ("WITH " + embedCtesWhere(" AND label = 3") + " " + embedSelect),

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
        "ORDER BY n_docs DESC, span LIMIT 25")
  )
}
