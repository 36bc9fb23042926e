package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}

import graft.operators.Stats

/** Cost-based optimization ([[graft.operators.Stats]]): ANALYZE'd
  * catalog statistics must reach Catalyst's plan stats, and
  * CostBasedJoinReorder must use them to replace a worst-case FROM
  * order — the capability the reference's delegated engine gets from
  * Glue catalog statistics.
  */
class CboSpec extends AnyFunSuite with SparkTestBase {

  private def register(): Unit = {
    Stats.enableCbo(spark)
    spark.sql("CREATE DATABASE IF NOT EXISTS cbo_db")
    Seq(
      ("lineitem",
        Seq("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")),
      ("orders", Seq("o_orderkey", "o_custkey", "o_totalprice")),
      ("customer", Seq("c_custkey", "c_nationkey")),
      ("supplier", Seq("s_suppkey", "s_nationkey")),
      ("nation", Seq("n_nationkey", "n_regionkey", "n_name")),
      ("region", Seq("r_regionkey", "r_name"))
    ).foreach { case (t, cols) =>
      Stats.registerAnalyzed(spark, s"cbo_db.$t",
        s"$sfDir/$t.parquet", cols) }
  }

  /** Leaf relation names in plan order — for a left-deep join tree the
    * first two are the DEEPEST join's inputs (the pair joined first).
    */
  private def leafTables(p: LogicalPlan): Seq[String] =
    p.collectLeaves().map(l =>
      "cbo_db\\.(\\w+)".r
        .findFirstMatchIn(l.toString.linesIterator.next())
        .map(_.group(1)).getOrElse(l.nodeName))

  test("ANALYZE'd row counts and column stats reach the optimizer's " +
      "plan statistics exactly") {
    register()
    val st = spark.table("cbo_db.orders")
      .queryExecution.optimizedPlan.stats
    val n = spark.read.parquet(s"$sfDir/orders.parquet").count()
    assert(st.rowCount.contains(BigInt(n)), st.toString)
    assert(st.attributeStats.nonEmpty, "no column stats propagated")
    // exact facets (null count, min/max) match ground truth; NDV is
    // the documented HLL++ estimate — bounded, not exact
    val byName = st.attributeStats.toSeq
      .map { case (a, cs) => a.name -> cs }.toMap
    val cs = byName("o_custkey")
    assert(cs.nullCount.contains(BigInt(0)))
    val row = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("min(o_custkey)", "max(o_custkey)",
        "count(distinct o_custkey)").head()
    assert(cs.min.map(_.toString.toLong).contains(row.getLong(0)))
    assert(cs.max.map(_.toString.toLong).contains(row.getLong(1)))
    val exactNdv = row.getLong(2).toDouble
    val ndv = cs.distinctCount.get.toDouble
    assert(math.abs(ndv - exactNdv) / exactNdv < 0.1,
      s"NDV estimate $ndv vs exact $exactNdv drifted past HLL bounds")
  }

  test("CostBasedJoinReorder replaces the worst-case FROM order; " +
      "without stats-driven reorder the FROM order survives") {
    register()
    val sql = """SELECT n_name, COUNT(*) AS cnt
      FROM cbo_db.lineitem, cbo_db.orders, cbo_db.customer,
        cbo_db.supplier, cbo_db.nation, cbo_db.region
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND r_name = 'ASIA'
      GROUP BY n_name"""
    def deepestPair(): Seq[String] = {
      val joins = spark.sql(sql).queryExecution.optimizedPlan
        .collect { case j: Join => j }
      assert(joins.nonEmpty, "no joins in the optimized plan")
      leafTables(joins.last).take(2)
    }
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    val heuristic = try deepestPair()
      finally spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    val reordered = deepestPair()
    // FROM-order planning joins the two FACT tables first; the
    // stats-driven order must not (it starts from a filtered/small end)
    assert(heuristic.toSet == Set("lineitem", "orders"),
      s"heuristic baseline changed: $heuristic")
    assert(reordered.toSet != Set("lineitem", "orders"),
      s"CBO kept the fact-fact join at the bottom: $reordered")
    // and the reordered plan still answers identically
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    val a = try spark.sql(sql).collect().map(r =>
        (r.getString(0), r.getLong(1))).toSet
      finally spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    val b = spark.sql(sql).collect().map(r =>
      (r.getString(0), r.getLong(1))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("planStats reads back what the optimizer sees — no rescan, " +
      "exact row/null/min/max") {
    register()
    val got = Stats.planStats(spark, "cbo_db.region").collect()
    assert(got.map(_.getString(0)).toSeq == Seq("r_name", "r_regionkey"))
    val rk = got.find(_.getString(0) == "r_regionkey").get
    assert(rk.getLong(1) == 5L && rk.getLong(2) == 0L &&
      rk.getDouble(4) == 0.0 && rk.getDouble(5) == 4.0, rk.toString)
    intercept[IllegalStateException] {
      spark.sql("DROP TABLE IF EXISTS cbo_db.unstats")
      spark.sql("CREATE TABLE cbo_db.unstats USING parquet LOCATION " +
        s"'$sfDir/part.parquet'")
      try Stats.planStats(spark, "cbo_db.unstats")
      finally spark.sql("DROP TABLE cbo_db.unstats")
    }
  }
}
