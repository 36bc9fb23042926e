package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.functions.TextFunctions

/** Deduplication operators for training-data pipelines, all expressed as
  * distributed dataflow (no driver-side loops):
  *
  *  - exact: content-hash group-by (shuffles 32-byte hashes, never text)
  *  - MinHash+LSH: shingle → k minhashes → banded buckets → self-join on
  *    band keys, so the quadratic all-pairs comparison never materializes
  *    (Broder 1997 "On the resemblance and containment of documents";
  *    banding per Mining of Massive Datasets §3.4)
  *  - SimHash: 64-bit fingerprint, Hamming-ball candidate join via the
  *    pigeonhole chunk trick (Manku, Jain, Sarma, WWW 2007)
  *  - exact n-gram Jaccard verification of candidate pairs
  */
object Dedup {

  // ---- exact -------------------------------------------------------------

  /** One row per distinct content: keeper id (min), copy count. The join
    * key is sha256(text) so the shuffle carries 64 hex chars per doc, not
    * document bodies — at 100 TB the shuffle is ~0.1% of input size.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), sha2(col(textCol), 256).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  // ---- MinHash -----------------------------------------------------------

  val ShingleSize = 3

  /** Deterministic splitmix64 stream for permutation constants. */
  private def splitmix(seed: Long): Iterator[Long] =
    Iterator.iterate(seed) { s => s + 0x9e3779b97f4a7c15L }.drop(1).map { z0 =>
      var z = z0
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }

  /** k (multiplier, offset) pairs, bounded to 30 bits (odd multipliers) so
    * `h32 * a + b` stays within a signed 64-bit long under ANSI mode.
    */
  private def perms(k: Int): Seq[(Long, Long)] = {
    val it = splitmix(42L)
    (0 until k).map(_ =>
      ((it.next() & 0x3fffffffL) | 1L, it.next() & 0x3fffffffL))
  }

  /** array<long> of k MinHash signature values for a text column.
    * Shingle hashes are computed once (xxhash64, codegen'd) and folded to
    * 32 bits; each signature value is min over an affine rehash — overflow-
    * free (32+30 < 63 bits), exact under ANSI mode.
    */
  def minhashSignature(text: Column, k: Int): Column = {
    val hs = transform(TextFunctions.shingles(text, ShingleSize),
      sh => pmod(xxhash64(sh), lit(4294967296L)))
    array(perms(k).map { case (a, b) =>
      array_min(transform(hs, h => h * a + b))
    }: _*)
  }

  /** array<long> of band keys: signature split into `bands` contiguous
    * groups, each hashed to one join key.
    */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      xxhash64(lit(b), slice(sig, b * rowsPerBand + 1, rowsPerBand))
    }: _*)

  /** Candidate near-dup pairs (idA < idB) with estimated Jaccard =
    * fraction of agreeing signature components.
    *
    * Scale shape: explode docs×bands → shuffle on (band, key) via the
    * self-equi-join → distinct pairs → join signatures back for the
    * estimate. Only ids and 8-byte keys move in the candidate shuffle;
    * signatures (k longs) are joined back only for surviving pairs.
    */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 32, bands: Int = 8): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val rowsPerBand = k / bands
    val sigs = docs
      .select(col(idCol).as("doc_id"),
        minhashSignature(col(textCol), k).as("sig"))
    val keyed = sigs
      .select(col("doc_id"),
        posexplode(bandKeys(col("sig"), bands, rowsPerBand))
          .as(Seq("band", "band_key")))
    val pairs = keyed.as("a")
      .join(keyed.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    pairs
      .join(sigs.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("sig", "sig_a"), "id_a")
      .join(sigs.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("sig", "sig_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => x === y), b => b)).cast(DoubleType) / k)
          .as("est_jaccard"))
  }

  /** Exact shingle-set Jaccard for given candidate pairs: re-derives the
    * shingle sets from the docs table for only the candidate ids (semi-join
    * pruned), so full shingle arrays never ride through the LSH shuffle.
    */
  def verifyJaccard(docs: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame): DataFrame = {
    val sets = docs.select(col(idCol).as("doc_id"),
      array_distinct(TextFunctions.shingles(col(textCol), ShingleSize))
        .as("sh"))
    pairs
      .join(sets.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sets.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
  }

  // ---- SimHash -----------------------------------------------------------

  /** Candidate near-dup pairs by SimHash, with Hamming distance attached.
    * The 64-bit fingerprint is split into `64 / chunkBits` chunks; a pair
    * within Hamming ≤ (nChunks - 1) agrees on at least one chunk
    * (pigeonhole), so a chunk-equality self-join finds every such pair
    * without an all-pairs scan. Callers filter/rank on `hamming`.
    */
  def simhashCandidates(docs: DataFrame, idCol: String, textCol: String,
      chunkBits: Int = 8): DataFrame = {
    require(64 % chunkBits == 0, "chunkBits must divide 64")
    val nChunks = 64 / chunkBits
    val mask = (1L << chunkBits) - 1
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val fps = docs.select(col(idCol).as("doc_id"),
      graft.functions.GraftFunctions
        .simhash64(TextFunctions.tokens(col(textCol))).as("fp"))
    val chunked = fps.select(col("doc_id"), col("fp"),
      posexplode(array((0 until nChunks).map { c =>
        shiftrightunsigned(col("fp"), c * chunkBits).bitwiseAND(lit(mask))
      }: _*)).as(Seq("chunk", "chunk_val")))
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") &&
          col("a.chunk_val") === col("b.chunk_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).cast(LongType)
          .as("hamming"))
      .distinct()
  }
}
