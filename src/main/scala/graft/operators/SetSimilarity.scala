package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.sources.Tables

/** EXACT Jaccard set-similarity SELF-JOIN — the lossless complement
  * to the MinHash+LSH near-dup path ([[graft.dedup.Dedup]]): LSH can
  * miss a true pair (bounded, spec-pinned probability); this operator
  * finds EVERY pair with Jaccard >= t, scalably, via the AllPairs /
  * PPJoin prefix filter (Bayardo et al., WWW 2007; Xiao et al., WWW
  * 2008 — public literature):
  *
  *  1. each record's distinct token set is ordered by GLOBAL token
  *     frequency (rarest first);
  *  2. a record of size s keeps only its first s - ceil(t*s) + 1
  *     tokens (the "prefix") — two sets with J >= t overlap in at
  *     least ceil(t/(1+t)*(s_a+s_b)) tokens, too many to avoid both
  *     prefixes (pigeonhole — lossless);
  *  3. candidates = equi-join on prefix tokens + the size window
  *     ceil(t*s_a) <= s_b <= floor(s_a/t);
  *  4. verify exact |A∩B| / |A∪B| on candidates only, via codegen'd
  *     array intersection over the (rarity-ordered, distinct) token
  *     arrays — intersection/union sizes are order-independent, so
  *     the ranked aggregate serves verification too.
  *
  * Hot tokens land in nobody's prefix (frequency ranking), so the
  * candidate join never degenerates to all-pairs on stopwords — the
  * failure mode a naive token join has on any natural corpus.
  *
  * Plan shape: one token-frequency aggregate, one shuffle keyed on
  * (rare) prefix tokens, verify on the surviving candidates.
  */
object SetSimilarity {

  /** All id pairs (id_a < id_b) with Jaccard(tokens_a, tokens_b) >= t,
    * with the exact intersection/union sizes and similarity. `tokens`
    * is an array column; duplicates within a record are ignored (set
    * semantics).
    */
  def jaccardSelfJoin(df: DataFrame, idCol: String, tokens: Column,
      t: Double): DataFrame = {
    require(t > 0.0 && t <= 1.0, s"threshold out of (0, 1]: $t")
    val base = Tables.spread(
      df.select(col(idCol).cast(LongType).as("id"),
        array_distinct(tokens).as("toks"))
        .withColumn("sz", size(col("toks")).cast(LongType))
        .filter(col("sz") > 0))
    val toks = base.select(col("id"), col("sz"),
      explode(col("toks")).as("tok"))
    val freq = toks.groupBy(col("tok"))
      .agg(count(lit(1)).as("f"))
    // ranked = each record's tokens total-ordered by global rarity
    // (f, tok) — ONE aggregate that feeds BOTH the prefix explosion
    // and the verification token arrays below, so the tokenize/
    // shingle pipeline is evaluated once, not once per consumer (the
    // r21 restructure: the verify stage previously re-derived its
    // token sets from the source, re-tokenizing the corpus twice
    // more; array_intersect/union are order-independent over the
    // distinct arrays, so rarity order verifies identically). The
    // aggregate is MATERIALIZED with a lineage cut (the clusters/
    // pagerank localCheckpoint pattern — recomputed from the parquet
    // inputs on every invocation, never across runs): four plan
    // subtrees consume it (prefix self-join ×2, verify sets ×2), and
    // uncut each would re-run the tokenize → frequency-join →
    // collect pipeline.
    val ranked = toks.join(freq, "tok")
      .groupBy(col("id"), col("sz"))
      .agg(array_sort(collect_list(struct(col("f"), col("tok"))))
        .as("ranked"))
      .localCheckpoint(true)
    // prefix = the sz - ceil(t*sz) + 1 globally-rarest tokens.
    // posexplode keeps each prefix token's POSITION in the record's
    // full frequency-sorted token list (a prefix IS that list's head,
    // so prefix position = global position) for the PPJoin positional
    // filter below.
    val prefix = ranked
      .select(col("id"), col("sz"),
        // EPSILON-SAFE ceiling: IEEE can round t*sz a hair ABOVE the
        // exact product (5 * 0.6 = 3.000…04), and a too-large ceil
        // SHRINKS the prefix — the lossy direction. Subtracting an
        // epsilon can only lengthen the prefix: more candidates,
        // never a missed pair (verification is exact).
        posexplode(slice(col("ranked"), lit(1),
          (col("sz") - ceil(col("sz") * lit(t) - lit(1e-9)) + 1)
            .cast("int")))
          .as(Seq("pos", "e")))
      .select(col("id"), col("sz"), col("pos"), col("e.tok").as("tok"))
    // POSITIONAL filter (PPJoin, Xiao et al. 2008): a shared prefix
    // token at 0-based positions (i, j) caps the possible overlap at
    // min(sz_a - i, sz_b - j) — everything before the shared token on
    // either side plus the token itself is the best case. Pairs whose
    // cap misses the required overlap ceil(t/(1+t)·(sz_a+sz_b)) are
    // dropped BEFORE the distinct/verify stages; epsilon keeps the
    // bound loose-side (more candidates, never a missed pair), and
    // the exhaustive oracle gates losslessness end to end. On
    // low-threshold prose corpora this is the difference between
    // near-all-pairs and a working candidate set.
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id") &&
          // size window, epsilon-loose for the same reason
          col("b.sz").cast(DoubleType) >=
            col("a.sz") * lit(t) - lit(1e-9) &&
          col("a.sz").cast(DoubleType) >=
            col("b.sz") * lit(t) - lit(1e-9) &&
          least(col("a.sz") - col("a.pos"),
            col("b.sz") - col("b.pos")).cast(DoubleType) >=
            ceil((col("a.sz") + col("b.sz")).cast(DoubleType) *
              lit(t / (1 + t)) - lit(1e-9)))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    // verification sets come from the SAME ranked aggregate as the
    // prefixes (its exchange is reused for both join-backs), never
    // from a fresh source scan
    val sets = ranked.select(col("id"),
      transform(col("ranked"), e => e("tok")).as("toks"), col("sz"))
    cand
      .join(sets.select(col("id").as("id_a"), col("toks").as("ta"),
        col("sz").as("sa")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("toks").as("tb"),
        col("sz").as("sb")), "id_b")
      .withColumn("inter",
        size(array_intersect(col("ta"), col("tb"))).cast(LongType))
      .withColumn("uni", col("sa") + col("sb") - col("inter"))
      .withColumn("jaccard",
        col("inter").cast(DoubleType) / col("uni").cast(DoubleType))
      .filter(col("jaccard") >= t)
      .select(col("id_a"), col("id_b"), col("inter"), col("uni"),
        col("jaccard"))
  }
}
