package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed count-min sketch over an item column — the frequency
  * sibling of the HLL distinct sketch (`q_hll_distinct`): approximate
  * per-item counts from a structure whose size is INDEPENDENT of the
  * corpus (`depth × width` cells), against the exact two-phase
  * aggregate's O(distinct items) state. The reference's delegated
  * engine ships `approx_distinct`-class sketches for exactly this
  * trade (BASELINE.json approx-aggregate surface); a 100 TB token
  * stream with billions of distinct tokens keeps the sketch at a few
  * thousand rows.
  *
  * Spark-first shape: the sketch IS a DataFrame of `(row, bucket,
  * cnt)` cells — built in ONE pass (map-side `posexplode` of the
  * `depth` hash buckets per item, then a two-phase aggregate whose
  * group count is capped at `depth × width`), mergeable cell-wise
  * across corpora or partitions ([[merge]]), and probed with a join
  * that broadcasts the PROBES (not the sketch) when small. Hashing is
  * `xxhash64(item, seed = hash row)` — deterministic and
  * engine-specific, so queries over it are rows-only checked with an
  * exact tolerance twin (ToleranceSpec), the `q_hll_distinct`
  * contract.
  *
  * Guarantees (standard CMS): an estimate NEVER undercounts;
  * overcount exceeds `(e / width) × N` (N = total items) with
  * probability at most `e^-depth` per probe.
  */
object CountMin {

  private def buckets(itemCol: Column, width: Int, depth: Int): Column =
    array((0 until depth).map(i =>
      pmod(xxhash64(itemCol, lit(i)), lit(width.toLong))): _*)

  /** Build the sketch table `(row, bucket, cnt)` over `items(itemCol)`.
    * At most `depth × width` rows; one scan of the input.
    */
  def sketch(items: DataFrame, itemCol: String, width: Int,
      depth: Int): DataFrame = {
    require(width >= 1 && depth >= 1, "width and depth must be >= 1")
    items
      .select(posexplode(buckets(col(itemCol), width, depth))
        .as(Seq("row", "bucket")))
      .groupBy(col("row"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Cell-wise sum of sketches built with the SAME (width, depth) —
    * the mergeability that lets per-partition or per-corpus sketches
    * combine without re-reading data.
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("row"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Estimated count per probe item: min over the `depth` cells the
    * item hashes to (absent cell = 0). The probe side is the small
    * side — `depth` rows per probe against a `depth × width`-row
    * sketch — so Spark broadcasts it; no corpus data is touched.
    *
    * Output is one row per DISTINCT item value (`itemCol`, `est_cnt`):
    * the estimate is a function of the value, so duplicate probe rows
    * would only repeat identical rows — callers needing the original
    * row set join the result back on `itemCol`. Only `itemCol` is
    * taken from `probes` (other probe columns never collide with the
    * sketch's `row`/`bucket`/`cnt` schema), but `itemCol` itself must
    * not shadow a sketch column.
    */
  def estimate(sk: DataFrame, probes: DataFrame, itemCol: String,
      width: Int, depth: Int): DataFrame = {
    require(width >= 1 && depth >= 1, "width and depth must be >= 1")
    require(!Seq("row", "bucket", "cnt").contains(itemCol),
      s"itemCol '$itemCol' shadows a sketch column — rename the probe " +
        "column")
    probes
      .select(col(itemCol),
        posexplode(buckets(col(itemCol), width, depth))
          .as(Seq("row", "bucket")))
      .join(sk, Seq("row", "bucket"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
  }
}
