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

  test("histogram ANALYZE records equi-height bins the range " +
      "estimator reads; the non-histogram table carries none") {
    Stats.enableCbo(spark)
    spark.sql("CREATE DATABASE IF NOT EXISTS cbo_db")
    Stats.registerAnalyzed(spark, "cbo_db.orders_hist",
      s"$sfDir/orders.parquet", Seq("o_totalprice"), histogram = true)
    def colStat(fq: String, name: String) = {
      val st = spark.table(fq).queryExecution.optimizedPlan.stats
      st.attributeStats.toSeq.map { case (a, cs) => a.name -> cs }
        .toMap.apply(name)
    }
    val hist = colStat("cbo_db.orders_hist", "o_totalprice").histogram
    assert(hist.isDefined, "histogram ANALYZE recorded no histogram")
    assert(hist.get.bins.length ==
      spark.conf.get("spark.sql.statistics.histogram.numBins").toInt)
    // equi-height: every bin carries the same per-bin ndv-weighted
    // mass contract; endpoints bracket the true min/max
    val Seq(mn, mx) = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("min(o_totalprice)", "max(o_totalprice)").head()
      .toSeq.map(_.asInstanceOf[Double])
    assert(hist.get.bins.head.lo <= mn && hist.get.bins.last.hi >= mx)
    // the plain register path (CboSpec.register) has stats but no bins
    register()
    assert(colStat("cbo_db.orders", "o_totalprice").histogram.isEmpty)
    spark.sql("DROP TABLE IF EXISTS cbo_db.orders_hist")
  }

  test("equi-height histograms flip a real plan decision: a skewed " +
      "range predicate broadcasts WITH bins, shuffles without them") {
    import spark.implicits._
    Stats.enableCbo(spark)
    spark.sql("CREATE DATABASE IF NOT EXISTS cbo_db")
    // skew: ONE row below 500k, the rest packed into [1.0M, 1.0001M].
    // min/max-only estimation assumes uniform, so `x <= 500000` rates
    // ~50% selective (≈50k rows — far over any broadcast threshold);
    // the equi-height bins see the mass sits above 1M and rate it at
    // a fraction of one bin (≈200 rows — trivially broadcastable).
    val skewDir = java.nio.file.Files
      .createTempDirectory("cbo_skew").toFile.getAbsolutePath
    val factDir = java.nio.file.Files
      .createTempDirectory("cbo_fact").toFile.getAbsolutePath
    (0L until 100000L).map(i =>
        (i, if (i == 0L) 0L else 1000000L + i % 100))
      .toDF("k", "x").write.mode("overwrite").parquet(skewDir)
    (0L until 50000L).map(i => (i, i % 7)).toDF("f_k", "f_v")
      .write.mode("overwrite").parquet(factDir)
    Stats.registerAnalyzed(spark, "cbo_db.skew_hist", skewDir,
      Seq("k", "x"), histogram = true)
    Stats.registerAnalyzed(spark, "cbo_db.skew_plain", skewDir,
      Seq("k", "x"), histogram = false)
    Stats.registerAnalyzed(spark, "cbo_db.cbo_fact", factDir,
      Seq("f_k", "f_v"))
    def q(t: String) = spark.sql(
      s"""SELECT f_v, x FROM cbo_db.$t JOIN cbo_db.cbo_fact
          ON k = f_k WHERE x <= 500000""")
    def isBroadcast(t: String): Boolean = {
      val plan = q(t).queryExecution.sparkPlan
      plan.collect { case b: org.apache.spark.sql.execution.joins
        .BroadcastHashJoinExec => b }.nonEmpty
    }
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "65536")
    try {
      assert(isBroadcast("skew_hist"),
        "histogram selectivity should shrink the filtered side under " +
          "the broadcast threshold:\n" +
          q("skew_hist").queryExecution.sparkPlan)
      assert(!isBroadcast("skew_plain"),
        "min/max-only estimation should overshoot the threshold " +
          "(if this broadcasts too, the histogram proved nothing):\n" +
          q("skew_plain").queryExecution.sparkPlan)
      // and both plans answer identically (the one matching row)
      val a = q("skew_hist").collect().toSeq.map(_.toSeq)
      val b = q("skew_plain").collect().toSeq.map(_.toSeq)
      assert(a == b && a.size == 1, s"$a / $b")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      Seq("skew_hist", "skew_plain", "cbo_fact").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS cbo_db.$t"))
    }
  }

  test("registered CDC tables feed the CBO from manifest metadata: " +
      "zero-scan row counts on the optimized plan, unregistered " +
      "raw-parquet reads stay size-only") {
    import spark.implicits._
    import graft.streaming.{CdcApply, CdcSql}
    Stats.enableCbo(spark)
    val root = java.nio.file.Files
      .createTempDirectory("cbo_cdc").toFile.getAbsolutePath
    val b0 = (1L to 500L).map(k => (k, 1L, k * 2.0, false))
      .toDF("k", "version", "v", "deleted")
    assert(CdcApply.applyBatch(b0, 0L, root, Seq("k"), "version",
      Some("deleted"), numBuckets = 4, commitTs = Some(1000L)))
    CdcSql.registerTable(spark, root, "cbo_cdc_t")
    try {
      val st = spark.sql("SELECT * FROM cbo_cdc_t")
        .queryExecution.optimizedPlan.stats
      val (bytes, rows) = CdcApply.manifestTotals(spark, root).get
      assert(rows == 500L, s"manifest rows $rows")
      assert(st.rowCount.contains(BigInt(rows)),
        s"CDC stats did not reach the optimizer: $st")
      assert(st.sizeInBytes > 0)
      // the same files read WITHOUT the registered name carry no row
      // count — the stats ride the manifest, not the files
      val raw = spark.read.parquet(
        CdcApply.readSnapshot(spark, root).get.inputFiles: _*)
      assert(raw.queryExecution.optimizedPlan.stats.rowCount.isEmpty)
      // stats refresh with the manifest: a second batch moves the count
      assert(CdcApply.applyBatch(
        (501L to 600L).map(k => (k, 1L, k * 2.0, false))
          .toDF("k", "version", "v", "deleted"),
        1L, root, Seq("k"), "version", Some("deleted"), numBuckets = 4,
        commitTs = Some(2000L)))
      val st2 = spark.sql("SELECT * FROM cbo_cdc_t")
        .queryExecution.optimizedPlan.stats
      assert(st2.rowCount.exists(_ > BigInt(rows)), st2.toString)
    } finally CdcSql.unregisterTable("cbo_cdc_t")
  }

  test("registerAnalyzed re-ANALYZEs when the data under an unchanged " +
      "location is rewritten in place; hostile names/paths refuse") {
    import spark.implicits._
    Stats.enableCbo(spark)
    spark.sql("CREATE DATABASE IF NOT EXISTS cbo_db")
    val dir = java.nio.file.Files
      .createTempDirectory("cbo_fp").toFile.getAbsolutePath
    (0L until 100L).map(i => (i, i * 2)).toDF("x", "y")
      .write.mode("overwrite").parquet(dir)
    def rowCount(): BigInt = {
      Stats.registerAnalyzed(spark, "cbo_db.fp_t", dir, Seq("x"))
      spark.table("cbo_db.fp_t").queryExecution.optimizedPlan
        .stats.rowCount.get
    }
    assert(rowCount() == BigInt(100))
    // same location, rewritten content: the file-listing fingerprint
    // must invalidate the memo (an identityHashCode+path memo would
    // serve the stale 100 forever)
    (0L until 250L).map(i => (i, i * 2)).toDF("x", "y")
      .write.mode("overwrite").parquet(dir)
    assert(rowCount() == BigInt(250),
      "stale CBO stats served after an in-place rewrite")
    intercept[IllegalArgumentException] {
      Stats.registerAnalyzed(spark, "bad-name; DROP TABLE x", dir, Nil)
    }
    intercept[IllegalArgumentException] {
      Stats.registerAnalyzed(spark, "cbo_db.ok_t", "/tmp/evil'path", Nil)
    }
    spark.sql("DROP TABLE IF EXISTS cbo_db.fp_t")
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
