package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Closed-form linear regression from EXACT integer moments — the
  * "learn a linear quality scorer over the corpus in one pass" operator
  * (the trainable flavor of `q_quality_score`'s hand-weighted heuristic;
  * reference analog: the regression a lake user runs by exporting
  * aggregates out of Athena).
  *
  * Shape: ONE partial-aggregated pass computes the normal-equation
  * moments (n, Σx1, Σx2, Σy, Σx1², Σx1x2, Σx2², Σx1y, Σx2y, Σy²) as
  * exact BIGINT sums over integer features — order-independent, so the
  * fit is deterministic under any partitioning. The 3×3 normal system
  * (two features + intercept) is then solved per group by Cramer's
  * rule as a FIXED expression tree of correctly-rounded double ops.
  * Both halves are the `q_corr_moments` design extended from one
  * statistic to a full fit: at 100 TB the shuffle carries ten longs
  * per group and the solve costs nothing.
  *
  * Determinism/oracle contract: every coefficient expression is built
  * from ONE SQL string ([[coefExprs]]) parsed by Spark's `expr` and
  * embedded verbatim in the DuckDB oracle — the two engines evaluate
  * the identical tree, so the fit (and R²) hash-compare bit-for-bit.
  * A numerically singular system yields NULL/NaN coefficients (no
  * silent pseudo-inverse); callers with degenerate features see it
  * loudly.
  *
  * Two features is a deliberate cap, not a limitation to hide: d
  * features need a d+1 × d+1 solve, whose closed form stops being an
  * auditable fixed expression — the moment-pass pattern generalizes,
  * the Cramer solve does not.
  */
object Regression {

  private def d(c: String): String = s"CAST($c AS DOUBLE)"

  /** 3×3 determinant of [[r1, r2, r3]] rows given as 9 column names,
    * fixed parenthesization.
    */
  private def det3(a11: String, a12: String, a13: String,
      a21: String, a22: String, a23: String,
      a31: String, a32: String, a33: String): String =
    s"(${d(a11)} * (${d(a22)} * ${d(a33)} - ${d(a23)} * ${d(a32)}) - " +
      s"${d(a12)} * (${d(a21)} * ${d(a33)} - ${d(a23)} * ${d(a31)}) + " +
      s"${d(a13)} * (${d(a21)} * ${d(a32)} - ${d(a22)} * ${d(a31)}))"

  /** Shared coefficient/fit expressions over the moment columns
    * (n, s1, s2, sy, s11, s12, s22, s1y, s2y, syy): SQL fragments used
    * BOTH as Spark `expr` and inside the DuckDB oracle, so the two
    * engines can never drift. Order: b0 (intercept), b1, b2, r2.
    */
  val coefExprs: Seq[(String, String)] = {
    // A = [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]], rhs = [sy,s1y,s2y]
    val detA = det3("n", "s1", "s2", "s1", "s11", "s12", "s2", "s12", "s22")
    val det0 = det3("sy", "s1", "s2", "s1y", "s11", "s12", "s2y", "s12", "s22")
    val det1 = det3("n", "sy", "s2", "s1", "s1y", "s12", "s2", "s2y", "s22")
    val det2 = det3("n", "s1", "sy", "s1", "s11", "s1y", "s2", "s12", "s2y")
    val b0 = s"($det0 / $detA)"
    val b1 = s"($det1 / $detA)"
    val b2 = s"($det2 / $detA)"
    // R² from the same exact moments: SSE = Σy² - (b0Σy + b1Σx1y + b2Σx2y),
    // SST = Σy² - (Σy)²/n, fixed order throughout
    val sse = s"(${d("syy")} - (($b0 * ${d("sy")} + $b1 * ${d("s1y")}) + " +
      s"$b2 * ${d("s2y")}))"
    val sst = s"(${d("syy")} - ${d("sy")} * ${d("sy")} / ${d("n")})"
    Seq("b0" -> b0, "b1" -> b1, "b2" -> b2, "r2" -> s"(1.0 - $sse / $sst)")
  }

  /** Fit `y ~ b0 + b1·x1 + b2·x2` per group. `x1`, `x2`, `y` must be
    * integer-valued expressions (quantize upstream — the exactness of
    * the moment sums is the determinism guarantee; a fractional input
    * would make them partition-order-dependent). Returns one row per
    * group: the group columns, `n`, `b0`, `b1`, `b2`, `r2`.
    */
  /** Internal column names of the moment/coefficient pipeline — a
    * group column with one of these names would silently collide with
    * the aggregate aliases (the Bloom/CountMin probe-contract lesson:
    * refuse reserved names loudly).
    */
  private val Reserved = Set("x1", "x2", "y", "n", "s1", "s2", "sy",
    "s11", "s12", "s22", "s1y", "s2y", "syy", "b0", "b1", "b2", "r2")

  def fitTwoFeature(df: DataFrame, groupCols: Seq[String], x1: Column,
      x2: Column, y: Column): DataFrame = {
    groupCols.foreach(g => require(!Reserved(g),
      s"group column '$g' collides with an internal moment name"))
    val base = df.select(groupCols.map(col) ++ Seq(
      x1.cast(LongType).as("x1"), x2.cast(LongType).as("x2"),
      y.cast(LongType).as("y")): _*)
    val moments = base
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
        sum(col("y")).as("sy"),
        sum(col("x1") * col("x1")).as("s11"),
        sum(col("x1") * col("x2")).as("s12"),
        sum(col("x2") * col("x2")).as("s22"),
        sum(col("x1") * col("y")).as("s1y"),
        sum(col("x2") * col("y")).as("s2y"),
        sum(col("y") * col("y")).as("syy"))
    moments.select(groupCols.map(col) ++ (col("n") +:
      coefExprs.map { case (name, e) => expr(e).as(name) }): _*)
  }

  /** The oracle side of [[fitTwoFeature]]: the full DuckDB SQL over a
    * `(groupCols, x1, x2, y)` source subquery, mirroring the Spark
    * plan moment for moment. `srcSql` must yield integer columns
    * `x1`, `x2`, `y` plus the group columns.
    */
  def oracleSql(srcSql: String, groupCols: Seq[String]): String = {
    val g = groupCols.mkString(", ")
    val coefs = coefExprs.map { case (n, e) => s"$e AS $n" }.mkString(", ")
    s"WITH m AS (SELECT $g, COUNT(*) AS n, " +
      "SUM(x1) AS s1, SUM(x2) AS s2, SUM(y) AS sy, " +
      "SUM(x1*x1) AS s11, SUM(x1*x2) AS s12, SUM(x2*x2) AS s22, " +
      "SUM(x1*y) AS s1y, SUM(x2*y) AS s2y, SUM(y*y) AS syy " +
      s"FROM ($srcSql) GROUP BY $g) " +
      s"SELECT $g, n, $coefs FROM m"
  }
}
