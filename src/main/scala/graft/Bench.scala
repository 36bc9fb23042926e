package graft
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Benchmark main: runs every declared query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Each query is forced through the `noop` sink (not `.count()`, which
  * lets Catalyst prune unreferenced projections — a map-only query like
  * q_mask_email would be timed without ever evaluating its masks).
  * Failures are NOT swallowed: a crashing query benches as -1 with its
  * error recorded in the `errors` field, so regressions are visible.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
      // cost-based planning posture: stats recorded by ANALYZE feed
      // Catalyst (join reorder needs row counts on every side)
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.planStats.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .config("spark.sql.extensions", "graft.governance.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        new java.io.File("target/spark-warehouse").getAbsolutePath)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmups: (a) classloading/codegen and the parquet-reader/
    // shuffle paths, so JVM warmup doesn't land on whichever query runs
    // first; (b) the queries that build persisted artifacts (bucketed
    // layouts, signature index, IVF centroids, partitioned events) — the
    // builds are one-time index construction, so the timed pass measures
    // steady-state query cost and runs are comparable round-over-round
    // regardless of the target/graft-data cache state.
    Seq("q_count_by_region", "q_distinct", "q_join_bucketed",
        "q_minhash_dup", "q_ann_ivf", "q_partition_prune",
        "q_ngram_jaccard", "q_dpp_join", "q_ann_kmeans",
        // every query whose first run builds a persisted artifact
        // (CDC snapshot roots, mirrors, rollup/index tables, the
        // dedup/near-dup incremental indexes): warming them keeps
        // pass 1 comparable to passes 2-3 regardless of the
        // target/graft-data cache state (r13: 147.9 s cold pass 1 vs
        // 58.4 s pass 3 came entirely from these builds)
        "q_cdc_rollup", "q_cdc_chain", "q_cdc_mor", "q_cdc_compact",
        "q_dedup_incremental", "q_neardup_incremental", "q_lookup_by",
        "q_quality_gate", "q_quarantine", "q_cdc_diff",
        "q_lookup", "q_bm25_topk", "q_cdc_restore", "q_ann_pq",
        "q_ann_ivfpq", "q_bpe_train", "q_entity_incremental",
        "q_bm25_incremental", "q_zorder", "q_compacted",
        "q_semantic_dedup", "q_corpus_overlap", "q_ngram_commonness",
        "q_ann_incremental", "q_dedup_clusters",
        // first run REGISTERS + ANALYZEs the stats_db tables (the
        // one-time catalog-statistics build; timed passes re-plan
        // against the cached stats)
        "q_cbo_join",
        // first runs build the Delta/Iceberg exports (incl. the
        // time-travel recipe's CDC root + two snapshot exports) and
        // the SQL-applied CDC root; later passes no-op the export and
        // replay the batch
        "q_delta_export", "q_iceberg_export", "q_iceberg_timetravel",
        "q_iceberg_v2", "q_cdc_rename",
        // first run trains + persists the language-ID profile
        "q_lang_id_learned",
        "q_sql_cdc_apply",
        // first run builds the persisted co-purchase edge list
        "q_pagerank").foreach { w =>
      try SparkEntry.queries(w)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    val errors = mutable.LinkedHashMap[String, String]()
    def timedPass(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            true
          } catch { case e: Throwable =>
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
              .linesIterator.take(1).mkString.take(300)
            false
          }
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }
    // three back-to-back timed passes: per-query harness noise on a
    // shared box is 2-4x, so the headline total is the MEDIAN of the
    // run totals and all three are reported — round-over-round
    // regressions become attributable to code, not scheduling.
    // Totals sum only queries that succeeded in EVERY pass: a query
    // failing in one pass but not another would otherwise make the
    // per-run totals sums over different query sets, and the median
    // could pick the artificially small one. (Any failure still sets
    // n_failed and a nonzero exit below.)
    val passes = Seq.fill(3)(timedPass())
    val everywhereOk: Set[String] = passes
      .map(_.collect { case (n, t) if t >= 0 => n }.toSet)
      .reduce(_ intersect _)
    val runTotals = passes.map(
      _.collect { case (n, t) if everywhereOk(n) => t }.sum)
    // HEAVY-TAIL tightening: queries whose 3-pass median exceeds 2 s
    // (pagerank, the near-dup/simjoin family) dominate the total AND
    // carry the widest shared-box noise, so they get two extra timed
    // samples and report a MEDIAN OF 5 — regressions in the tail
    // become attributable under noise that 3 samples cannot absorb.
    def median(ts: Seq[Double]): Double = {
      val s = ts.sorted; s(s.size / 2)
    }
    val med3: Map[String, Double] = passes.head.map { case (name, _) =>
      name -> median(passes.map(_.toMap.apply(name)))
    }.toMap
    val heavy = med3.collect {
      case (n, t) if t > 2.0 && everywhereOk(n) => n }.toSet
    val extra: Map[String, Seq[Double]] =
      if (heavy.isEmpty) Map.empty
      else Seq.fill(2)(heavy.toSeq.sorted.map { name =>
        val t0 = System.nanoTime()
        try {
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          name -> (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          // an extra-sample crash is STILL a failure (the class doc's
          // no-swallowing contract): record it so n_failed and the
          // exit code expose an intermittent heavy-tail regression
          errors(name) = Option(e.getMessage)
            .getOrElse(e.getClass.getName)
            .linesIterator.take(1).mkString.take(300)
          name -> -1.0
        }
      }).flatten.filter(_._2 >= 0)
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    // per-query MEDIANS (3 samples; 5 for the heavy tail), the same
    // statistic family as the headline; a query that failed any pass
    // reports -1, matching everywhereOk
    val results = passes.head.map { case (name, _) =>
      name -> (if (!everywhereOk(name)) -1.0
               else median(passes.map(_.toMap.apply(name)) ++
                 extra.getOrElse(name, Seq.empty)))
    }
    def esc(s: String): String =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => " "
        case c => c.toString
      }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
      .mkString("{", ",", "}")
    val total = runTotals.sorted.apply(runTotals.size / 2) // median
    val runsJson = runTotals.mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","runs":$runsJson,"queries":$qs,"errors":$errJson,"n_failed":${errors.size},"sf":"$sfDir"}"""
    println(line)
    // also persist the line: the driver's stdout capture window has
    // truncated the (now ~116-query) JSON twice (BENCH_r12/r13 both
    // landed with parsed:null), losing the headline total — the file
    // copy makes the artifact self-contained
    val out = new java.io.File("target/bench.json")
    out.getParentFile.mkdirs()
    val w = new java.io.PrintWriter(out, "UTF-8")
    try w.println(line) finally w.close()
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
