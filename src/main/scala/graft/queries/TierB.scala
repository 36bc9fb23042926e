package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.sources.Tables

/** Tier B — the general relational surface the reference delegates to
  * Athena (SURVEY.md §2 Tier B), pinned down one representative query per
  * operator family, on the driver's TPC-H-ish testdata.
  *
  * Determinism conventions (SURVEY §7.5): every query ends in a total
  * ORDER BY with a unique tie-break; float aggregates go through
  * DECIMAL(18,2) so the sum is exact and order-independent, then cast back
  * to DOUBLE (identical correctly-rounded value in Spark and DuckDB);
  * integer-ish outputs are cast to BIGINT on both sides.
  */
object TierB {

  type Q = (SparkSession, String) => DataFrame

  private val dec = DecimalType(18, 2)

  /** Order-independent exact sum of a 2-decimal double column → double. */
  private def dsum(c: Column): Column = sum(c.cast(dec)).cast(DoubleType)

  /** Exact per-row revenue: price * (1 - discount) in decimal → double. */
  private def revenue(price: Column, discount: Column): Column =
    (price.cast(dec) * (lit(1) - discount.cast(dec))).cast(DoubleType)

  private val revenueSql =
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
      "(1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)"

  private def dsumSql(col: String): String =
    s"CAST(SUM(CAST($col AS DECIMAL(18,2))) AS DOUBLE)"

  /** Register + ANALYZE the six Q5 tables as `stats_db` catalog tables
    * and enable CBO — the Glue-crawler-feeds-the-engine posture.
    * Idempotent per (session, location): every declared query may call
    * it; only the first pays the ANALYZE scans.
    */
  private def cboTables(s: SparkSession, d: String): Unit = {
    import graft.operators.Stats
    Stats.enableCbo(s)
    s.sql("CREATE DATABASE IF NOT EXISTS stats_db")
    Seq(
      ("lineitem",
        Seq("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")),
      ("orders", Seq("o_orderkey", "o_custkey", "o_totalprice")),
      ("customer", Seq("c_custkey", "c_nationkey")),
      ("supplier", Seq("s_suppkey", "s_nationkey")),
      ("nation", Seq("n_nationkey", "n_regionkey", "n_name")),
      ("region", Seq("r_regionkey", "r_name"))
    ).foreach { case (t, cols) =>
      Stats.registerAnalyzed(s, s"stats_db.$t", s"$d/$t.parquet", cols) }
  }

  val queries: Map[String, Q] = Map(

    // B1 — equi inner join, small dimension broadcast: lineitem ⋈ part.
    // At scale: part is the dimension side → BroadcastHashJoinExec, no
    // shuffle of the fact table.
    "q_join_inner_hash" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("cnt"),
          dsum(col("l_extendedprice")).as("total_price"))
        .orderBy(col("p_brand"))),

    // B2 — fact-fact equi join: orders ⋈ lineitem as sort-merge (both sides
    // large at 100 TB; merge hint models that even though AQE would
    // broadcast at test SF).
    "q_join_sortmerge" -> ((s, d) =>
      Tables.orders(s, d).hint("merge")
        .join(Tables.lineitem(s, d),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"),
          dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("o_orderpriority"))),

    // B3 — left outer join preserving order-less customers.
    "q_join_left_outer" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          dsum(col("o_totalprice")).as("total_spent"))
        .orderBy(col("c_custkey"))),

    // B4 — left semi (IN/EXISTS): customers with a >400k order.
    "q_join_semi" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 400000.0),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy(col("c_custkey"))),

    // B5 — left anti (NOT EXISTS): customers with no 'P'-status order.
    "q_join_anti" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy(col("c_custkey"))),

    // B6 — non-equi range (theta) join: part size bands → region rows.
    // Broadcast-nested-loop with the 5-row side broadcast: safe at scale.
    "q_join_theta_range" -> ((s, d) =>
      Tables.part(s, d)
        .join(broadcast(Tables.region(s, d)),
          col("p_size").between(col("r_regionkey") * 10 + 1,
            col("r_regionkey") * 10 + 10))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("cnt"),
          dsum(col("p_retailprice")).as("total_price"))
        .orderBy(col("r_name"))),

    // B5b — NULL-SAFE equality join (<=>): NULL keys match each other,
    // where plain equality would silently drop every NULL-keyed row
    // (here: customers whose segment was nulled out still land in the
    // null dimension bucket). EqualNullSafe is a supported hash-join key,
    // so the plan is a normal shuffled hash/sort-merge join — no
    // null-handling penalty at scale.
    "q_join_nullsafe" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .select(col("c_custkey"),
          expr("nullif(c_mktsegment, 'BUILDING')").as("nk"))
      val dim = c.select(col("nk").as("dim_nk")).distinct()
      c.join(dim, col("nk") <=> col("dim_nk"))
        .groupBy(coalesce(col("dim_nk"), lit("<null>")).as("seg"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("seg"))
    }),

    // B6b — as-of (point-in-time) join, trades-to-quotes shape: each
    // purchase event picks up the most recent AT-OR-BEFORE view snapshot
    // for its user. ONE window sweep per user (operators/AsOfJoin.scala)
    // — one shuffle, linear per key — instead of a range join's
    // candidate-pair explosion. Right side pre-aggregated to unique
    // (user, ts) so the matched row is well-defined in every engine.
    // Oracle: DuckDB's native ASOF LEFT JOIN.
    "q_join_asof" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts"))
        .agg(dsum(col("value")).as("view_value"))
        .select(col("user_id"), col("ts").as("view_ts"), col("view_value"))
      graft.operators.AsOfJoin.asOf(purchases, views, Seq("user_id"),
        "ts", "view_ts")
        .orderBy(col("event_id"))
    }),

    // B7 — multi-aggregate group-by (TPC-H Q1 shape): partial/final hash
    // aggregate, map-side combine before the shuffle.
    "q_agg_multi" -> ((s, d) =>
      // spread (no-op at production file counts): the partial-aggregate
      // phase — Expand ×2 for the distinct count + decimal sums over
      // 600k rows — otherwise runs inside a one-split scan task
      Tables.spread(Tables.lineitem(s, d))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          // sum the exact decimal(·,4) product — no intermediate rounding
          // (a cast back to (18,2) would hit half-rounding dialect drift)
          sum(col("l_extendedprice").cast(dec) *
            (lit(1) - col("l_discount").cast(dec)))
            .cast(DoubleType).as("sum_disc_price"),
          (sum(col("l_quantity").cast(dec)).cast(DoubleType) /
            count(lit(1))).as("avg_qty"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // B8a — ROLLUP with sentinel labels (no NULL-ordering dialect drift).
    "q_agg_rollup" -> ((s, d) =>
      Tables.spread(Tables.lineitem(s, d))
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("_ALL_")).as("rf"),
          coalesce(col("l_linestatus"), lit("_ALL_")).as("ls"),
          col("cnt"), col("sum_qty"))
        .orderBy(col("rf"), col("ls"))),

    // B8b — CUBE.
    "q_agg_cube" -> ((s, d) =>
      Tables.spread(Tables.lineitem(s, d))
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("_ALL_")).as("rf"),
          coalesce(col("l_linestatus"), lit("_ALL_")).as("ls"),
          col("cnt"), col("sum_qty"))
        .orderBy(col("rf"), col("ls"))),

    // B9 — ranking window: top-3 orders per customer.
    "q_window_rank" -> ((s, d) => {
      val byPrice = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          rank().over(byPrice).cast(LongType).as("rnk"),
          dense_rank().over(byPrice).cast(LongType).as("drnk"),
          row_number().over(byPrice).cast(LongType).as("rn"))
        .filter(col("rn") <= 3)
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // B10 — analytic frame: running total + lag/lead per customer.
    "q_window_running" -> ((s, d) => {
      val byDate = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast(dec))
            .over(byDate.rowsBetween(Window.unboundedPreceding,
              Window.currentRow))
            .cast(DoubleType).as("running_total"),
          lag(col("o_totalprice"), 1).over(byDate).as("prev_price"),
          lead(col("o_totalprice"), 1).over(byDate).as("next_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // B10c — RANGE-framed window: trailing one-hour per-user running
    // totals, ordered by event time. A range frame bounds by VALUE
    // distance (microsecond epochs — exact integers in both engines;
    // second-granularity epochs would truncate differently), not row
    // count, and equal-timestamp peers share a frame. One shuffle on
    // user_id; per-partition sorted sweep.
    "q_window_range_frame" -> ((s, d) => {
      val hourUs = 3600L * 1000000L
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("epoch_us"))
        .rangeBetween(-(hourUs - 1), 0)
      Tables.events(s, d)
        .filter(col("event_id") < 3000)
        .withColumn("epoch_us", unix_micros(col("ts").cast("timestamp")))
        .select(col("event_id"), col("user_id"), col("epoch_us"),
          count(lit(1)).over(w).as("cnt_1h"),
          sum(col("value").cast(dec)).over(w).cast(DoubleType)
            .as("sum_1h"))
        .orderBy(col("event_id"))
    }),

    // B12b — MapType round-trip: per-user event-type counts built into a
    // map column (map_from_entries over a SORTED entry list — map column
    // equality is order-sensitive, so the sort is what makes the value
    // deterministic), then exploded back to rows with the map's size.
    // Exercises map construction, explode-of-map, and map cardinality;
    // output is plain columns so the oracle compares engine-neutrally.
    "q_map_funcs" -> ((s, d) => {
      val g = Tables.events(s, d)
        .filter(col("user_id") < 20)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      g.groupBy(col("user_id"))
        .agg(map_from_entries(array_sort(collect_list(
          struct(col("event_type"), col("cnt"))))).as("counts"))
        .select(col("user_id"),
          size(col("counts")).cast("long").as("n_types"),
          explode(col("counts")).as(Seq("etype", "cnt")))
        .select(col("user_id"), col("etype"), col("cnt"), col("n_types"))
        .orderBy(col("user_id"), col("etype"))
    }),

    // B11 — global top-k: TakeOrderedAndProject, no full sort at scale.
    // B28 — LATERAL correlated subquery (per-group top-n as the inner
    // query shape, distinct from the window formulation): for each
    // region, its first two nations. Catalyst decorrelates the LIMIT'd
    // lateral into a ranked join — same plan family as q_window_rank,
    // but exercising the decorrelation path raw SQL users hit.
    "q_lateral_topn" -> ((s, d) => {
      Tables.region(s, d).createOrReplaceTempView("region_v")
      Tables.nation(s, d).createOrReplaceTempView("nation_v")
      s.sql("SELECT r.r_name, l.n_name FROM region_v r, " +
        "LATERAL (SELECT n_name FROM nation_v n " +
        "WHERE n.n_regionkey = r.r_regionkey " +
        "ORDER BY n_name LIMIT 2) l " +
        "ORDER BY r.r_name, l.n_name")
    }),

    // MERGE/upsert as a declared query: a base snapshot (orders at
    // version 1) merged with a repriced update batch (every 10th order
    // at version 2) through Upsert.latestWins — latest version wins per
    // key with ONE shuffle (ranking window), no join. The aggregation
    // proves exactly the updated keys changed. This is the lake's
    // CDC-apply path expressed as pure dataflow (no transactional
    // format available in this environment).
    "q_merge_upsert" -> ((s, d) => {
      val base = Tables.orders(s, d).withColumn("version", lit(1L))
      val updates = Tables.orders(s, d)
        .filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice",
          (col("o_totalprice").cast(dec) * 2).cast(DoubleType))
        .withColumn("version", lit(2L))
      graft.operators.Upsert
        .latestWins(base, updates, Seq("o_orderkey"), "version")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"),
          dsum(col("o_totalprice")).as("total_price"))
        .orderBy(col("o_orderstatus"))
    }),

    // Composite TPC-H-Q3-shaped query: three-way star join with a
    // selective dimension filter, revenue aggregation, top-k — join
    // ordering + AQE end-to-end in one declared query. Plan shape at
    // scale: the filtered customer dimension broadcasts (no fact
    // shuffle for its join); orders⋈lineitem shuffles once on the order
    // key with both date filters pushed to the parquet scans; the top-k
    // is TakeOrderedAndProject, never a full sort. Revenue is a sum of
    // exact decimal products (one final cast to double), so the total is
    // order-independent and bit-comparable across engines.
    "q_composite_topk" -> ((s, d) => {
      val cutoff = lit("1996-03-15 00:00:00").cast("timestamp_ntz")
      val c = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d).filter(col("o_orderdate") < cutoff)
      val l = Tables.lineitem(s, d).filter(col("l_shipdate") > cutoff)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
        .agg(sum(col("l_extendedprice").cast(dec) *
          (lit(1) - col("l_discount").cast(dec)))
          .cast(DoubleType).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    "q_sort_topk" -> ((s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)),

    // B12 — set ops on nation keys of customers vs suppliers.
    "q_union" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .union(Tables.supplier(s, d).select(col("s_nationkey")))
        .distinct()
        .orderBy(col("nationkey"))),

    "q_intersect" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .intersect(Tables.supplier(s, d)
          .select(col("s_nationkey").as("nationkey")))
        .orderBy(col("nationkey"))),

    "q_except" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .except(Tables.supplier(s, d)
          .select(col("s_nationkey").as("nationkey")))
        .orderBy(col("nationkey"))),

    // B12b — MULTISET set ops (the ALL variants): per-row bag
    // semantics — a nation with 60 customers and 4 suppliers keeps 56
    // rows in the except and 4 in the intersect. Duplicate output rows
    // are identical, so the nationkey sort is a total order for the
    // hash gate. Spark plans these as aggregate+generate (sum of
    // signed counts), never a join explosion.
    "q_except_all" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .exceptAll(Tables.supplier(s, d)
          .select(col("s_nationkey").as("nationkey")))
        .orderBy(col("nationkey"))),

    "q_intersect_all" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .intersectAll(Tables.supplier(s, d)
          .select(col("s_nationkey").as("nationkey")))
        .orderBy(col("nationkey"))),

    // B13 — string functions.
    "q_scalar_string" -> ((s, d) =>
      Tables.customer(s, d)
        .filter(col("c_name").like("%e%"))
        .select(col("c_custkey"),
          upper(col("c_name")).as("name_upper"),
          substring(col("c_name"), 1, 8).as("name_prefix"),
          length(col("c_name")).cast(LongType).as("name_len"),
          concat(col("c_mktsegment"), lit("#"),
            col("c_custkey").cast("string")).as("seg_key"))
        .orderBy(col("c_custkey"))),

    // B14 — date functions over timestamps.
    "q_scalar_date" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(
          year(col("o_orderdate")).cast(LongType).as("order_year"),
          month(col("o_orderdate")).cast(LongType).as("order_month"),
          date_trunc("month", col("o_orderdate")).as("month_start"))
        .agg(count(lit(1)).as("cnt"),
          dsum(col("o_totalprice")).as("total_price"))
        .orderBy(col("order_year"), col("order_month"))),

    // B15 — arithmetic + CASE WHEN.
    "q_scalar_math" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_quantity") >= 48.0)
        .select(col("l_orderkey"), col("l_linenumber"),
          when(col("l_discount") > 0.05, "HIGH")
            .when(col("l_discount") > 0.02, "MID")
            .otherwise("LOW").as("disc_band"),
          revenue(col("l_extendedprice"), col("l_discount")).as("rev"),
          (col("l_quantity") * col("l_quantity")).as("qty_sq"),
          floor(col("l_extendedprice")).cast(LongType).as("price_floor"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // B16 — DISTINCT.
    "q_distinct" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // B17 — scalar subquery (exact decimal avg → identical threshold).
    "q_subquery_scalar" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val thresh = o.agg((sum(col("o_totalprice").cast(dec))
        .cast(DoubleType) / count(lit(1))).as("t"))
      o.join(broadcast(thresh))
        .filter(col("o_totalprice") > col("t") * 1.5)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_orderkey"))
    }),

    // B18 — co-located bucketed join: orders and lineitem written
    // hash-bucketed on the order key, so this (and every later) join on
    // that key is a ZERO-SHUFFLE sort-merge — no Exchange under the join
    // (asserted in BucketingSpec). The one-time bucketed write amortizes
    // across all downstream joins: the 100 TB fact-table layout.
    "q_join_bucketed" -> ((s, d) => {
      val oKey = graft.sources.Artifacts.datasetKey(d, s"$d/orders.parquet")
        .replace(".", "_")
      val lKey = graft.sources.Artifacts
        .datasetKey(d, s"$d/lineitem.parquet").replace(".", "_")
      val o = graft.operators.Bucketing.ensureBucketed(s,
        Tables.orders(s, d), s"bkt_orders_$oKey", "o_orderkey")
      val l = graft.operators.Bucketing.ensureBucketed(s,
        Tables.lineitem(s, d), s"bkt_lineitem_$lKey", "l_orderkey")
      // merge hint: at 100 TB neither fact side broadcasts; the bucketed
      // layout then makes the sort-merge join exchange-free.
      o.hint("merge").join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("total_qty"))
        .orderBy(col("o_orderpriority"))
    }),

    // B24 — FILTER (WHERE ...) aggregates: per-aggregate predicates in
    // one two-phase hash aggregate pass — no per-predicate subquery or
    // self-join, the ANSI form the delegated engine supports.
    "q_agg_filter" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("b24_lineitem")
      s.sql("""SELECT l_returnflag, COUNT(*) AS cnt,
                 COUNT(*) FILTER (WHERE l_quantity > 25) AS cnt_hi,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                   FILTER (WHERE l_discount > 0.05) AS DOUBLE)
                   AS qty_disc
               FROM b24_lineitem
               GROUP BY l_returnflag ORDER BY l_returnflag""")
    }),

    // B22 — cost-based join reorder: the six-table TPC-H-Q5 shape
    // written in the WORST FROM order (fact ⋈ fact first), planned
    // against ANALYZE'd catalog tables with CBO on. The FROM-order
    // heuristic would join lineitem ⋈ orders before any dimension
    // filter; CostBasedJoinReorder's DP, fed the recorded row counts
    // and join-key NDVs, starts from the filtered region ⋈ nation end
    // instead — the stats-driven ordering the reference's delegated
    // engine gets from Glue statistics (CboSpec pins the reorder;
    // correctness here pins the result).
    "q_cbo_join" -> ((s, d) => {
      cboTables(s, d)
      s.sql("""SELECT n_name,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                   (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                   AS revenue
               FROM stats_db.lineitem, stats_db.orders,
                 stats_db.customer, stats_db.supplier,
                 stats_db.nation, stats_db.region
               WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
                 AND l_suppkey = s_suppkey
                 AND c_nationkey = s_nationkey
                 AND s_nationkey = n_nationkey
                 AND n_regionkey = r_regionkey AND r_name = 'ASIA'
               GROUP BY n_name
               ORDER BY revenue DESC, n_name""")
    }),

    // B23 — the statistics themselves, read back from where the
    // optimizer reads them (the catalog's plan stats, not a re-scan):
    // exact row/null/min/max per analyzed column. NDV is excluded
    // here (ANALYZE records the HLL++ estimate — pinned in CboSpec
    // against exact counts instead).
    "q_analyze_stats" -> ((s, d) => {
      cboTables(s, d)
      graft.operators.Stats.planStats(s, "stats_db.orders")
        .filter(col("col_name").isin("o_orderkey", "o_custkey",
          "o_totalprice"))
        .select(col("col_name"), col("row_count"), col("null_count"),
          col("min_val"), col("max_val"))
        .orderBy(col("col_name"))
    }),

    // B19 — salted skewed aggregation: two-phase groupBy spreads hot keys
    // over 16 sub-reducers; the final combine is key-count × 16 rows.
    // Result is provably equal to the direct aggregation (same oracle
    // shape as a plain GROUP BY — determinism via decimal sums).
    "q_skew_salted_agg" -> ((s, d) =>
      graft.operators.Skew.saltedCountSum(
          Tables.events(s, d)
            .select(col("event_type"), col("value").cast(dec).as("v")),
          "event_type", "v", salts = 16)
        .select(col("event_type"), col("cnt"),
          col("total").cast(DoubleType).as("total_value"),
          col("min_v").cast(DoubleType).as("min_value"),
          col("max_v").cast(DoubleType).as("max_value"))
        .orderBy(col("event_type"))),

    // B20 — correlated EXISTS subquery (decorrelated by Catalyst into a
    // left-semi join).
    "q_subquery_exists" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("b20_customer")
      Tables.orders(s, d).createOrReplaceTempView("b20_orders")
      s.sql("""SELECT c_custkey, c_name FROM b20_customer c
               WHERE EXISTS (SELECT 1 FROM b20_orders o
                             WHERE o.o_custkey = c.c_custkey
                               AND o.o_totalprice > 300000)
               ORDER BY c_custkey""")
    }),

    // B21 — pivot: per-year revenue spread over fixed region columns
    // (explicit value list → deterministic output schema).
    "q_pivot" -> ((s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(s, d),
          col("c_nationkey") === col("n_nationkey"))
        .select(year(col("o_orderdate")).cast(LongType).as("order_year"),
          col("n_name"), col("o_totalprice").cast(dec).as("price"))
        .groupBy(col("order_year"))
        .pivot("n_name", Seq("CHINA", "FRANCE", "KENYA"))
        .agg(sum(col("price")).cast(DoubleType))
        .orderBy(col("order_year"))),

    // B22 — lateral explode (generator): one row per word of p_name.
    "q_explode_words" -> ((s, d) =>
      Tables.part(s, d)
        .filter(col("p_partkey") <= 200)
        .select(col("p_partkey"),
          posexplode(split(col("p_name"), " ")).as(Seq("pos", "word")))
        .select(col("p_partkey"), col("pos").cast(LongType).as("pos"),
          col("word"))
        .orderBy(col("p_partkey"), col("pos"))),

    // B23 — array functions over grouped data: sorted type list per
    // brand (array_sort makes collect_set order-insensitive).
    "q_array_funcs" -> ((s, d) =>
      Tables.part(s, d)
        .filter(col("p_partkey") <= 500)
        .groupBy(col("p_brand"))
        .agg(
          array_sort(collect_set(col("p_type"))).as("types"),
          size(array_sort(collect_set(col("p_type"))))
            .cast(LongType).as("n_types"))
        .select(col("p_brand"),
          array_join(col("types"), ",").as("types"),
          col("n_types"))
        .orderBy(col("p_brand"))),

    // B24 — GROUPING SETS with grouping() disambiguation of the NULL
    // rollup rows.
    "q_grouping_sets" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("b24_lineitem")
      s.sql(s"""SELECT l_returnflag, l_linestatus,
                  COUNT(*) AS cnt,
                  CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
                  CAST(grouping(l_linestatus) AS BIGINT) AS g_status
                FROM b24_lineitem
                GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                        (l_returnflag), ())
                ORDER BY g_flag, g_status, l_returnflag, l_linestatus""")
    }),

    // B25 — null semantics: COALESCE / NULLIF / IS DISTINCT FROM.
    "q_scalar_null" -> ((s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderkey") <= 2000)
        .select(col("o_orderkey"),
          coalesce(nullif(col("o_orderpriority"), lit("1-URGENT")),
            lit("URGENT")).as("prio"),
          expr("o_orderstatus IS DISTINCT FROM o_orderpriority")
            .as("status_differs"))
        .orderBy(col("o_orderkey"))),

    // B27 — exact percentiles (linear interpolation) + the sketch-based
    // scale path (approx_percentile, mergeable t-digest-style partials).
    // Exact columns are oracle-checked; the approx column rides along
    // rows-only in q_percentile_approx below.
    "q_percentiles" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.9)").as("p90"),
          expr("percentile(l_quantity, 0.99)").as("p99"))
        .orderBy(col("l_returnflag"))),

    // rows-only: sketch percentile (error-bounded, mergeable partials —
    // the 100 TB path where exact percentile's full sort is infeasible).
    "q_percentile_approx" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(percentile_approx(col("l_quantity"), lit(0.5), lit(10000))
          .as("p50_approx"))
        .orderBy(col("l_returnflag"))),

    // B26 — value-based window frame + distribution functions.
    // B27 — navigation window functions over the FULL partition frame
    // (first/last/nth): unbounded-following frames are the one window
    // shape that cannot stream within a partition — the operator buffers
    // the partition (spilling when large), so partitioning on a real key
    // is what keeps it scalable.
    "q_window_firstlast" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .filter(col("o_custkey") <= 200)
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(w).as("first_order"),
          last(col("o_orderkey")).over(w).as("last_order"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_order"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    "q_window_ntile" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d)
        .filter(col("o_orderkey") <= 4000)
        .select(col("o_orderkey"), col("o_orderpriority"),
          ntile(4).over(w).cast(LongType).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy(col("o_orderkey"))
    }),

    // B28 — full outer join: unmatched rows from BOTH sides survive with
    // NULLs on the other. Full outer cannot broadcast (every row of both
    // sides must be matched exactly once), so Spark plans a sort-merge
    // join — one shuffle of each side on the key, the same cost shape as
    // the inner join at 100 TB.
    "q_join_full_outer" -> ((s, d) =>
      Tables.customer(s, d)
        .filter(col("c_custkey") <= 900)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 450000.0),
          col("c_custkey") === col("o_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          col("c_custkey").isNotNull.as("has_cust"),
          col("o_orderkey"))
        .orderBy(col("custkey"), col("o_orderkey").asc_nulls_first)),

    // B29 — unpivot (melt): wide per-line measures to long
    // (measure, value) rows. A generator expand, no shuffle — scales
    // linearly with input and keeps whole-stage codegen.
    "q_unpivot" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") <= 400)
        .select(col("l_orderkey"),
          col("l_linenumber").cast(LongType).as("l_linenumber"),
          col("l_quantity").as("qty"), col("l_extendedprice").as("price"),
          col("l_discount").as("disc"))
        .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("qty"), col("price"), col("disc")),
          "measure", "val")
        // (l_orderkey, l_linenumber) is NOT unique in lineitem — `val`
        // completes the total order the hash compare needs
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("measure"),
          col("val"))),

    // B31 — correlation / covariance from exact integer moments. One
    // partial-aggregated pass computes (n, Σx, Σy, Σx², Σy², Σxy) as
    // exact BIGINTs — order-independent, so the result is deterministic
    // under any partitioning, unlike a float-accumulating corr() whose
    // low bits depend on merge order. The Pearson/covariance formulas
    // then run on those exact sums as correctly-rounded double
    // arithmetic, identical in any IEEE engine. This is the mergeable
    // two-phase shape CentralMomentAgg uses internally, made exact; at
    // 100 TB the shuffle carries 6 longs per group.
    "q_corr_moments" -> ((s, d) => {
      val toD = (c: String) => col(c).cast(DoubleType)
      val cov = (toD("n") * toD("sxy") - toD("sx") * toD("sy"))
      Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          col("l_quantity").cast(LongType).as("x"),
          floor(col("l_extendedprice")).cast(LongType).as("y"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .select(col("l_returnflag"), col("n"),
          (cov / (sqrt(toD("n") * toD("sxx") - toD("sx") * toD("sx")) *
            sqrt(toD("n") * toD("syy") - toD("sy") * toD("sy"))))
            .as("corr_qty_price"),
          (cov / (toD("n") * toD("n"))).as("covar_pop"))
        .orderBy(col("l_returnflag"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_agg_filter" ->
      ("SELECT l_returnflag, COUNT(*) AS cnt, " +
        "COUNT(*) FILTER (WHERE l_quantity > 25) AS cnt_hi, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) " +
        "FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS qty_disc " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "q_cbo_join" ->
      ("SELECT n_name, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) " +
        "* (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS " +
        "revenue FROM lineitem, orders, customer, supplier, nation, " +
        "region WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey " +
        "AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey " +
        "AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey " +
        "AND r_name = 'ASIA' GROUP BY n_name " +
        "ORDER BY revenue DESC, n_name"),
    "q_analyze_stats" ->
      Seq("o_custkey", "o_orderkey", "o_totalprice").map(c =>
        s"SELECT '$c' AS col_name, CAST(COUNT(*) AS BIGINT) AS " +
          s"row_count, CAST(COUNT(*) - COUNT($c) AS BIGINT) AS " +
          s"null_count, CAST(MIN($c) AS DOUBLE) AS min_val, " +
          s"CAST(MAX($c) AS DOUBLE) AS max_val FROM orders")
        .mkString("", " UNION ALL ", " ORDER BY col_name"),
    "q_join_inner_hash" ->
      ("SELECT p_brand, COUNT(*) AS cnt, " + dsumSql("l_extendedprice") +
        " AS total_price FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "GROUP BY p_brand ORDER BY p_brand"),
    "q_join_sortmerge" ->
      ("SELECT o_orderpriority, COUNT(*) AS cnt, " + dsumSql("l_quantity") +
        " AS sum_qty FROM orders JOIN lineitem ON o_orderkey = l_orderkey " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "q_join_left_outer" ->
      ("SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders, " +
        dsumSql("o_totalprice") + " AS total_spent " +
        "FROM customer LEFT JOIN orders ON c_custkey = o_custkey " +
        "GROUP BY c_custkey, c_name ORDER BY c_custkey"),
    "q_join_semi" ->
      ("SELECT c_custkey, c_name, c_mktsegment FROM customer " +
        "WHERE c_custkey IN (SELECT o_custkey FROM orders " +
        "WHERE o_totalprice > 400000.0) ORDER BY c_custkey"),
    "q_join_anti" ->
      ("SELECT c_custkey, c_name FROM customer c " +
        "WHERE NOT EXISTS (SELECT 1 FROM orders o " +
        "WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P') " +
        "ORDER BY c_custkey"),
    "q_join_theta_range" ->
      ("SELECT r_name, COUNT(*) AS cnt, " + dsumSql("p_retailprice") +
        " AS total_price FROM part JOIN region " +
        "ON p_size BETWEEN r_regionkey * 10 + 1 AND r_regionkey * 10 + 10 " +
        "GROUP BY r_name ORDER BY r_name"),
    "q_map_funcs" ->
      ("WITH g AS (SELECT user_id, event_type AS etype, COUNT(*) AS cnt " +
        "FROM events WHERE user_id < 20 GROUP BY user_id, event_type) " +
        "SELECT user_id, etype, cnt, " +
        "COUNT(*) OVER (PARTITION BY user_id) AS n_types FROM g " +
        "ORDER BY user_id, etype"),
    "q_join_nullsafe" ->
      ("WITH c AS (SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') " +
        "AS nk FROM customer), d AS (SELECT DISTINCT nk AS dim_nk FROM c) " +
        "SELECT COALESCE(d.dim_nk, '<null>') AS seg, COUNT(*) AS cnt " +
        "FROM c JOIN d ON c.nk IS NOT DISTINCT FROM d.dim_nk " +
        "GROUP BY 1 ORDER BY seg"),
    "q_window_range_frame" ->
      ("SELECT event_id, user_id, epoch_us(ts) AS epoch_us, " +
        "COUNT(*) OVER w AS cnt_1h, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) " +
        "AS sum_1h FROM events WHERE event_id < 3000 " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) " +
        "RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW) " +
        "ORDER BY event_id"),
    "q_join_asof" ->
      ("WITH p AS (SELECT event_id, user_id, ts, value FROM events " +
        "WHERE event_type = 'purchase'), " +
        "v AS (SELECT user_id, ts AS view_ts, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS view_value " +
        "FROM events WHERE event_type = 'view' GROUP BY user_id, ts) " +
        "SELECT p.event_id, p.user_id, p.ts, p.value, v.view_ts, " +
        "v.view_value FROM p ASOF LEFT JOIN v " +
        "ON p.user_id = v.user_id AND p.ts >= v.view_ts " +
        "ORDER BY p.event_id"),
    "q_agg_multi" ->
      ("SELECT l_returnflag, l_linestatus, " +
        dsumSql("l_quantity") + " AS sum_qty, " +
        dsumSql("l_extendedprice") + " AS sum_base_price, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) " +
        "AS sum_disc_price, " +
        dsumSql("l_quantity") + " / COUNT(*) AS avg_qty, " +
        "MIN(l_extendedprice) AS min_price, " +
        "MAX(l_extendedprice) AS max_price, " +
        "COUNT(DISTINCT l_orderkey) AS n_orders, COUNT(*) AS cnt " +
        "FROM lineitem GROUP BY l_returnflag, l_linestatus " +
        "ORDER BY l_returnflag, l_linestatus"),
    "q_agg_rollup" ->
      ("SELECT COALESCE(l_returnflag, '_ALL_') AS rf, " +
        "COALESCE(l_linestatus, '_ALL_') AS ls, COUNT(*) AS cnt, " +
        dsumSql("l_quantity") + " AS sum_qty FROM lineitem " +
        "GROUP BY ROLLUP (l_returnflag, l_linestatus) ORDER BY rf, ls"),
    "q_agg_cube" ->
      ("SELECT COALESCE(l_returnflag, '_ALL_') AS rf, " +
        "COALESCE(l_linestatus, '_ALL_') AS ls, COUNT(*) AS cnt, " +
        dsumSql("l_quantity") + " AS sum_qty FROM lineitem " +
        "GROUP BY CUBE (l_returnflag, l_linestatus) ORDER BY rf, ls"),
    "q_window_rank" ->
      ("SELECT o_custkey, o_orderkey, o_totalprice, rnk, drnk, rn FROM (" +
        "SELECT o_custkey, o_orderkey, o_totalprice, " +
        "RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk, " +
        "ROW_NUMBER() OVER w AS rn FROM orders " +
        "WINDOW w AS (PARTITION BY o_custkey " +
        "ORDER BY o_totalprice DESC, o_orderkey)) " +
        "WHERE rn <= 3 ORDER BY o_custkey, rn"),
    "q_window_running" ->
      ("SELECT o_custkey, o_orderkey, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER " +
        "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) " +
        "AS running_total, " +
        "LAG(o_totalprice, 1) OVER w AS prev_price, " +
        "LEAD(o_totalprice, 1) OVER w AS next_price FROM orders " +
        "WINDOW w AS (PARTITION BY o_custkey " +
        "ORDER BY o_orderdate, o_orderkey) " +
        "ORDER BY o_custkey, o_orderkey"),
    "q_lateral_topn" ->
      ("SELECT r.r_name, l.n_name FROM region r, " +
        "LATERAL (SELECT n_name FROM nation n " +
        "WHERE n.n_regionkey = r.r_regionkey " +
        "ORDER BY n_name LIMIT 2) l " +
        "ORDER BY r.r_name, l.n_name"),
    "q_merge_upsert" ->
      ("SELECT o_orderstatus, COUNT(*) AS cnt, " +
        "CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) " +
        "AS total_price FROM (SELECT o_orderstatus, " +
        "CASE WHEN o_orderkey % 10 = 0 " +
        "THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DOUBLE) " +
        "ELSE o_totalprice END AS price FROM orders) " +
        "GROUP BY o_orderstatus ORDER BY o_orderstatus"),
    "q_composite_topk" ->
      ("SELECT l_orderkey, o_orderdate, o_orderpriority, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue " +
        "FROM customer JOIN orders ON c_custkey = o_custkey " +
        "JOIN lineitem ON l_orderkey = o_orderkey " +
        "WHERE c_mktsegment = 'BUILDING' " +
        "AND o_orderdate < TIMESTAMP '1996-03-15' " +
        "AND l_shipdate > TIMESTAMP '1996-03-15' " +
        "GROUP BY 1, 2, 3 ORDER BY revenue DESC, l_orderkey LIMIT 10"),
    "q_sort_topk" ->
      ("SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 20"),
    "q_union" ->
      ("SELECT c_nationkey AS nationkey FROM customer UNION " +
        "SELECT s_nationkey FROM supplier ORDER BY nationkey"),
    "q_intersect" ->
      ("SELECT c_nationkey AS nationkey FROM customer INTERSECT " +
        "SELECT s_nationkey AS nationkey FROM supplier ORDER BY nationkey"),
    "q_except" ->
      ("SELECT c_nationkey AS nationkey FROM customer EXCEPT " +
        "SELECT s_nationkey AS nationkey FROM supplier ORDER BY nationkey"),
    "q_except_all" ->
      ("SELECT c_nationkey AS nationkey FROM customer EXCEPT ALL " +
        "SELECT s_nationkey AS nationkey FROM supplier " +
        "ORDER BY nationkey"),
    "q_intersect_all" ->
      ("SELECT c_nationkey AS nationkey FROM customer INTERSECT ALL " +
        "SELECT s_nationkey AS nationkey FROM supplier " +
        "ORDER BY nationkey"),
    "q_scalar_string" ->
      ("SELECT c_custkey, UPPER(c_name) AS name_upper, " +
        "SUBSTRING(c_name, 1, 8) AS name_prefix, " +
        "CAST(LENGTH(c_name) AS BIGINT) AS name_len, " +
        "c_mktsegment || '#' || CAST(c_custkey AS VARCHAR) AS seg_key " +
        "FROM customer WHERE c_name LIKE '%e%' ORDER BY c_custkey"),
    "q_scalar_date" ->
      ("SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS order_year, " +
        "CAST(MONTH(o_orderdate) AS BIGINT) AS order_month, " +
        "DATE_TRUNC('month', o_orderdate) AS month_start, " +
        "COUNT(*) AS cnt, " + dsumSql("o_totalprice") + " AS total_price " +
        "FROM orders GROUP BY 1, 2, 3 ORDER BY order_year, order_month"),
    "q_scalar_math" ->
      ("SELECT l_orderkey, l_linenumber, " +
        "CASE WHEN l_discount > 0.05 THEN 'HIGH' " +
        "WHEN l_discount > 0.02 THEN 'MID' ELSE 'LOW' END AS disc_band, " +
        revenueSql + " AS rev, l_quantity * l_quantity AS qty_sq, " +
        "CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor " +
        "FROM lineitem WHERE l_quantity >= 48.0 " +
        "ORDER BY l_orderkey, l_linenumber"),
    "q_distinct" ->
      ("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem " +
        "ORDER BY l_returnflag, l_linestatus"),
    "q_subquery_scalar" ->
      ("SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
        "WHERE o_totalprice > (SELECT " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) " +
        "/ COUNT(*) FROM orders) * 1.5 ORDER BY o_orderkey"),
    "q_join_bucketed" ->
      ("SELECT o_orderpriority, COUNT(*) AS cnt, " +
        dsumSql("l_quantity") + " AS total_qty " +
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "q_skew_salted_agg" ->
      ("SELECT event_type, COUNT(*) AS cnt, " +
        dsumSql("value") + " AS total_value, " +
        "CAST(MIN(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_value, " +
        "CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_value " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "q_subquery_exists" ->
      ("SELECT c_custkey, c_name FROM customer c WHERE EXISTS " +
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey " +
        "AND o.o_totalprice > 300000) ORDER BY c_custkey"),
    "q_pivot" ->
      ("SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) " +
        "AS order_year, " +
        "CAST(SUM(CASE WHEN n_name = 'CHINA' THEN " +
        "CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS CHINA, " +
        "CAST(SUM(CASE WHEN n_name = 'FRANCE' THEN " +
        "CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS FRANCE, " +
        "CAST(SUM(CASE WHEN n_name = 'KENYA' THEN " +
        "CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS KENYA " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "GROUP BY 1 ORDER BY order_year"),
    "q_explode_words" ->
      ("SELECT p_partkey, CAST(u.pos - 1 AS BIGINT) AS pos, u.word " +
        "FROM (SELECT p_partkey, unnest(list_transform(" +
        "string_split(p_name, ' '), (w, i) -> " +
        "struct_pack(word := w, pos := i))) AS u " +
        "FROM part WHERE p_partkey <= 200) " +
        "ORDER BY p_partkey, pos"),
    "q_array_funcs" ->
      ("SELECT p_brand, list_aggregate(list_sort(list(DISTINCT " +
        "p_type)), 'string_agg', ',') AS types, " +
        "CAST(len(list_sort(list(DISTINCT p_type))) AS BIGINT) " +
        "AS n_types FROM part WHERE p_partkey <= 500 " +
        "GROUP BY p_brand ORDER BY p_brand"),
    "q_grouping_sets" ->
      ("SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt, " +
        "CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag, " +
        "CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status " +
        "FROM lineitem GROUP BY GROUPING SETS ((l_returnflag, " +
        "l_linestatus), (l_returnflag), ()) " +
        "ORDER BY g_flag, g_status, l_returnflag, l_linestatus"),
    "q_scalar_null" ->
      ("SELECT o_orderkey, COALESCE(NULLIF(o_orderpriority, " +
        "'1-URGENT'), 'URGENT') AS prio, " +
        "o_orderstatus IS DISTINCT FROM o_orderpriority " +
        "AS status_differs " +
        "FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey"),
    "q_percentiles" ->
      ("SELECT l_returnflag, " +
        "quantile_cont(l_quantity, 0.5) AS p50, " +
        "quantile_cont(l_quantity, 0.9) AS p90, " +
        "quantile_cont(l_quantity, 0.99) AS p99 " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "q_window_firstlast" ->
      ("SELECT o_custkey, o_orderkey, " +
        "FIRST_VALUE(o_orderkey) OVER w AS first_order, " +
        "LAST_VALUE(o_orderkey) OVER w AS last_order, " +
        "NTH_VALUE(o_orderkey, 2) OVER w AS second_order " +
        "FROM orders WHERE o_custkey <= 200 " +
        "WINDOW w AS (PARTITION BY o_custkey " +
        "ORDER BY o_orderdate, o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) " +
        "ORDER BY o_custkey, o_orderkey"),
    "q_window_ntile" ->
      ("SELECT o_orderkey, o_orderpriority, " +
        "CAST(NTILE(4) OVER w AS BIGINT) AS quartile, " +
        "PERCENT_RANK() OVER w AS pct_rank, " +
        "CUME_DIST() OVER w AS cume " +
        "FROM orders WHERE o_orderkey <= 4000 " +
        "WINDOW w AS (PARTITION BY o_orderpriority " +
        "ORDER BY o_totalprice, o_orderkey) ORDER BY o_orderkey"),
    "q_join_full_outer" ->
      ("SELECT COALESCE(c_custkey, o_custkey) AS custkey, " +
        "c_custkey IS NOT NULL AS has_cust, o_orderkey " +
        "FROM (SELECT * FROM customer WHERE c_custkey <= 900) c " +
        "FULL JOIN (SELECT * FROM orders WHERE o_totalprice > 450000.0) o " +
        "ON c_custkey = o_custkey " +
        "ORDER BY custkey, o_orderkey NULLS FIRST"),
    "q_unpivot" ->
      ("WITH src AS (SELECT l_orderkey, " +
        "CAST(l_linenumber AS BIGINT) AS l_linenumber, " +
        "l_quantity AS qty, l_extendedprice AS price, l_discount AS disc " +
        "FROM lineitem WHERE l_orderkey <= 400) " +
        "SELECT l_orderkey, l_linenumber, measure, val FROM src " +
        "UNPIVOT (val FOR measure IN (qty, price, disc)) " +
        "ORDER BY l_orderkey, l_linenumber, measure, val"),
    "q_corr_moments" ->
      ("WITH m AS (SELECT l_returnflag, COUNT(*) AS n, " +
        "SUM(x) AS sx, SUM(y) AS sy, SUM(x*x) AS sxx, SUM(y*y) AS syy, " +
        "SUM(x*y) AS sxy FROM (SELECT l_returnflag, " +
        "CAST(l_quantity AS BIGINT) AS x, " +
        "CAST(floor(l_extendedprice) AS BIGINT) AS y FROM lineitem) " +
        "GROUP BY l_returnflag) " +
        "SELECT l_returnflag, n, " +
        "(CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - " +
        "CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)) / " +
        "(sqrt(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - " +
        "CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) * " +
        "sqrt(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE) - " +
        "CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))) AS corr_qty_price, " +
        "(CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - " +
        "CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)) / " +
        "(CAST(n AS DOUBLE)*CAST(n AS DOUBLE)) AS covar_pop " +
        "FROM m ORDER BY l_returnflag")
  )
}
