package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join: for each left row, the most recent right
  * row AT OR BEFORE the left timestamp within the same key — the standard
  * temporal enrichment of time-series and feature-store pipelines (attach
  * the prevailing quote to each trade, the last profile snapshot to each
  * event). The reference's delegated engine exposes this family through
  * Trino/Athena SQL; Spark has no built-in as-of join, so this is the one
  * whole-operator composition the library adds on top of Tier B's joins.
  *
  * Scale shape: NOT a range join. The generic `l.ts >= r.ts` theta-join
  * (see `q_join_theta_range`) materializes every (left, right) candidate
  * pair per key before keeping the max — O(|L|·|R|) per key, quadratic on
  * dense keys at 100 TB. Here the two sides are UNION-tagged and swept by
  * ONE window pass per key: sort by (ts, side) and carry the last seen
  * right-side row forward (`last(_, ignoreNulls).over(window)`). One
  * shuffle on the key, linear work per partition, no pair explosion, and
  * Spark's window operator spills sorted runs for skewed keys instead of
  * buffering pairs.
  *
  * Semantics:
  *  - a right row at EXACTLY the left timestamp is visible ("at or
  *    before"): ties sort the right row first via the side tag;
  *  - left rows with no prior right row get NULL right fields (left
  *    join), via a typed null struct;
  *  - the right row rides as ONE struct, so a genuinely-NULL payload
  *    field in the matched row stays NULL (per-column carry would skip
  *    it and leak an older value);
  *  - the right side must be unique per (key, rightTs) — pre-aggregate
  *    upstream (duplicate right timestamps would make "the" matched row
  *    ambiguous in any engine);
  *  - NULL join keys follow equality-join semantics: a NULL-keyed right
  *    row matches nothing (dropped before the sweep — the window would
  *    otherwise group NULL keys together and leak NULL-keyed right rows
  *    into NULL-keyed left rows), while a NULL-keyed left row is kept
  *    with NULL right fields (left join).
  */
object AsOfJoin {

  /** Left-as-of join `left` to `right` on equal `on` keys with
    * `right.rightTs <= left.leftTs`. Output: every left column, then the
    * matched right timestamp and payload columns (NULL when unmatched).
    * Right payload column names must not collide with left columns.
    */
  def asOf(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTs: String, rightTs: String): DataFrame = {
    val payload =
      right.columns.filterNot(c => on.contains(c) || c == rightTs)
    require(payload.nonEmpty,
      "right side needs at least one payload column besides key and ts")
    val clash = payload.intersect(left.columns)
    require(clash.isEmpty,
      s"right payload collides with left columns: ${clash.mkString(",")}")
    val reserved = Seq("_ts", "_side", "_r")
      .filter(r => left.columns.contains(r) || right.columns.contains(r))
    require(reserved.isEmpty,
      s"reserved column names in use: ${reserved.mkString(",")}")
    val rFields = rightTs +: payload
    val rStruct = StructType(rFields.map(right.schema(_)))
    val leftOther = left.columns.filterNot(on.contains).toSeq
    val lNorm = left.select(
      on.map(col) ++ Seq(col(leftTs).as("_ts"), lit(1).as("_side"),
        lit(null).cast(rStruct).as("_r")) ++ leftOther.map(col): _*)
    // NULL-keyed right rows can never satisfy an equality join; left
    // NULL-keyed rows then sweep an empty partition and stay unenriched.
    val rNonNull = right.filter(on.map(col(_).isNotNull).reduce(_ && _))
    val rNorm = rNonNull.select(
      on.map(col) ++ Seq(col(rightTs).as("_ts"), lit(0).as("_side"),
        struct(rFields.toIndexedSeq.map(col): _*).as("_r")) ++
        leftOther.map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lNorm.unionByName(rNorm)
      .withColumn("_r", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(left.columns.map(col).toSeq ++
        rFields.map(f => col(s"_r.$f").as(f)): _*)
  }
}
