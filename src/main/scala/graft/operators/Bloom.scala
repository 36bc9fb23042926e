package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Bloom filter over an item column — the membership
  * sibling of [[CountMin]]: "is this item in the set" from a structure
  * whose size is bounded by the BIT ARRAY (`m` set-bit rows at most),
  * not the set. The scale path for benchmark decontamination when the
  * eval shingle set outgrows a broadcast (`q_decontaminate` broadcasts
  * the exact set — fine for real benchmarks; a multi-benchmark union
  * or a dedup-against-prior-corpus check is not a few MB).
  *
  * Spark-first shape: the filter IS a DataFrame of distinct set bit
  * positions — built in one pass (map-side `posexplode` of the `k`
  * bit positions per item, distinct ≤ m rows), unionable across sets
  * ([[merge]] is a plain distinct union), and probed with a join that
  * broadcasts the BIT TABLE (bounded by m) against the arbitrarily
  * large probe side. Hashing is `xxhash64(item, seed)` — deterministic
  * and engine-specific, so declared queries over it are rows-only with
  * an exact twin (the `q_hll_distinct` contract).
  *
  * Guarantees: NO false negatives (a member's bits are all set by
  * construction); false-positive probability per probe approximately
  * `(1 - e^(-k·n/m))^k` for n inserted items.
  */
object Bloom {

  private def bitsOf(itemCol: Column, m: Long, k: Int): Column =
    array((0 until k).map(i =>
      pmod(xxhash64(itemCol, lit(i)), lit(m))): _*)

  /** The filter's set-bit table (`bit`), at most `m` rows. */
  def build(items: DataFrame, itemCol: String, m: Long,
      k: Int): DataFrame = {
    require(m >= 1 && k >= 1, "m and k must be >= 1")
    items
      .select(explode(bitsOf(col(itemCol), m, k)).as("bit"))
      .distinct()
  }

  /** Filters built with the same (m, k) union into their set-union. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).distinct()

  /** `probes` with a `might_contain` flag: true iff EVERY one of the
    * item's `k` bit positions is set. The bit table (≤ m rows) is the
    * broadcast side; the probe side streams map-side — no shuffle of
    * probe data. Distinct bit positions are checked (two hash rows
    * landing on one bit must not double-count a single match).
    */
  def mightContain(filter: DataFrame, probes: DataFrame,
      itemCol: String, m: Long, k: Int): DataFrame = {
    require(m >= 1 && k >= 1, "m and k must be >= 1")
    val marked = filter.withColumn("_set", lit(true))
    probes
      .withColumn("bit",
        explode(array_distinct(bitsOf(col(itemCol), m, k))))
      .join(broadcast(marked), Seq("bit"), "left")
      .groupBy(probes.columns.map(col).toIndexedSeq: _*)
      .agg(min(coalesce(col("_set"), lit(false)))
        .as("might_contain"))
  }
}
