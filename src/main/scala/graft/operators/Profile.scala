package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Column-level data profiling — the engine-side analog of Glue's table
  * statistics / data-quality profiling (reference `main.tf:291-300`
  * registers the catalog that Glue crawlers profile): per-column row,
  * null, exact-distinct and min/max stats in one long-format frame.
  *
  * One aggregation pass over the input produces every column's stats
  * (Spark plans the multiple COUNT(DISTINCT)s as a single scan with an
  * Expand — n profiled columns multiply the aggregate's input n-fold,
  * which is the inherent cost of EXACT distinct counts; the sketch path
  * for 100 TB profiling is approx_count_distinct / HLL, declared
  * separately as q_hll_distinct). min/max compute on the native type
  * (numeric order, not lexicographic) and cast to string only for the
  * uniform output schema.
  */
object Profile {

  /** Profile `cols` of `df` → one row per column:
    * (col_name, n_rows, n_nonnull, n_distinct, min_val, max_val),
    * ordered by col_name.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    require(cols.distinct == cols, "cols must be distinct")
    val aggs: Seq[Column] = cols.flatMap(c => Seq(
      count(col(c)).as(s"nn_$c"),
      countDistinct(col(c)).as(s"nd_$c"),
      min(col(c)).cast(StringType).as(s"mn_$c"),
      max(col(c)).cast(StringType).as(s"mx_$c")))
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stacked = array(cols.map(c => struct(
      lit(c).as("col_name"), col("n_rows"),
      col(s"nn_$c").as("n_nonnull"), col(s"nd_$c").as("n_distinct"),
      col(s"mn_$c").as("min_val"), col(s"mx_$c").as("max_val"))): _*)
    one.select(explode(stacked).as("p")).select(col("p.*"))
      .orderBy(col("col_name"))
  }
}
