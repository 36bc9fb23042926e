package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.ColumnStat
import org.apache.spark.sql.types.{DoubleType, LongType, StringType,
  StructField, StructType}

/** Table/column statistics fed to Catalyst's cost-based optimizer —
  * the engine-side analog of the Glue crawler statistics the
  * reference's catalog carries (reference `main.tf:291-300` registers
  * exactly the Glue database/table a crawler profiles, and the
  * delegated Athena/Trino engine plans joins off those stats).
  *
  * [[graft.operators.Profile]] computes profiles as a RESULT; this
  * object is the half that matters at 100 TB: the same statistics
  * recorded WHERE THE OPTIMIZER READS THEM (the session catalog, via
  * `ANALYZE TABLE`), plus the CBO switches that make Catalyst use
  * them. With row counts and column NDVs on every join input,
  * `CostBasedJoinReorder` replaces the FROM-clause join order with the
  * cost-ranked one — on a 3+ table star join that is the difference
  * between a pruned and an exploded intermediate, which AQE alone
  * cannot recover once the bad join has shuffled.
  *
  * Scale shape: `ANALYZE ... COMPUTE STATISTICS` is one count+size
  * pass, `FOR COLUMNS` one aggregate pass (null count, min/max exact;
  * NDV via HyperLogLog++ — never a distinct explosion); both are
  * catalog WRITES done once per table refresh, amortized over every
  * query that plans against them.
  */
object Stats {

  /** Turn on cost-based planning for the session: plan statistics
    * propagation, CBO costing, and stats-driven join reorder.
    * Idempotent runtime confs — safe on every entry path (queries
    * that never touch analyzed catalog tables are unaffected, because
    * reorder requires row counts on every join side).
    */
  def enableCbo(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.planStats.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
  }

  // (sessionUUID, fq-table) -> analyzed (location + data fingerprint);
  // re-analyze when the location OR the files under it change (a fresh
  // sf dir, or the same dir rewritten in place), never per invocation
  private val analyzed = new ConcurrentHashMap[String, String]()

  // 1- or 2-part SQL identifier of plain-identifier parts — the names
  // this engine's queries use; anything else (quotes, spaces, hyphens)
  // is refused rather than interpolated into DDL
  private val FqRe = "[A-Za-z_][A-Za-z0-9_]*(\\.[A-Za-z_][A-Za-z0-9_]*)?"

  /** Driver-side fingerprint of the data under `location`: every file's
    * (relative name, length, mtime) hashed — one FS listing, no scan.
    * Same-location data rewritten in place changes the fingerprint, so
    * the memo re-ANALYZEs instead of serving stale CBO stats.
    */
  private def fingerprint(spark: SparkSession, location: String): String = {
    val p = new org.apache.hadoop.fs.Path(location)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return "absent"
    val buf = new StringBuilder
    def walk(d: org.apache.hadoop.fs.Path): Unit =
      fs.listStatus(d).sortBy(_.getPath.getName).foreach { st =>
        if (st.isDirectory) walk(st.getPath)
        else buf.append(st.getPath.getName).append(':')
          .append(st.getLen).append(':')
          .append(st.getModificationTime).append(';')
      }
    walk(p)
    java.util.UUID.nameUUIDFromBytes(
      buf.toString.getBytes("UTF-8")).toString
  }

  /** Register a parquet directory as catalog table `fq` and record
    * row/size + column statistics for `cols` — the Glue-crawler step,
    * driven by the engine. Idempotent per (session, table, location,
    * data fingerprint): repeated calls from every declared query are
    * one catalog probe + one FS listing, not one scan. Returns `fq`.
    */
  def registerAnalyzed(spark: SparkSession, fq: String, location: String,
      cols: Seq[String], histogram: Boolean = false): String =
    synchronized {
      require(fq.matches(FqRe),
        s"table name '$fq' is not a plain 1- or 2-part SQL identifier")
      require(!location.contains("'"),
        s"location '$location' contains a quote — refusing to " +
          "interpolate it into DDL")
      // sessionUUID is private[sql] — public in bytecode (the same
      // pragmatic seam as CdcChangelogSource's internalCreateDataFrame);
      // unlike identityHashCode it can never collide or be reused by a
      // GC'd session
      val sessionId = spark.getClass.getMethod("sessionUUID")
        .invoke(spark).toString
      val key = sessionId + ":" + fq
      val stamp = location + "#" + fingerprint(spark, location)
      if (analyzed.get(key) == stamp) return fq
      spark.sql(s"DROP TABLE IF EXISTS $fq")
      spark.sql(s"CREATE TABLE $fq USING parquet LOCATION '$location'")
      spark.sql(s"ANALYZE TABLE $fq COMPUTE STATISTICS")
      if (cols.nonEmpty) {
        // histogram = equi-height bins per column (range-predicate
        // selectivity far beyond min/max); one extra aggregate pass,
        // so it is opt-in per table, the ANALYZE trade Spark documents
        val conf = "spark.sql.statistics.histogram.enabled"
        val prev = spark.conf.get(conf, "false")
        spark.conf.set(conf, histogram.toString)
        try spark.sql(
          s"ANALYZE TABLE $fq COMPUTE STATISTICS FOR COLUMNS " +
            cols.mkString(", "))
        finally spark.conf.set(conf, prev)
      }
      analyzed.put(key, stamp)
      fq
    }

  /** The statistics Catalyst actually sees for `fq`, read back from
    * the relation's plan stats (NOT re-derived from data): one row per
    * analyzed column — (col_name, row_count, null_count, n_distinct,
    * min_val, max_val), numerics rendered as doubles. row_count /
    * null_count / min / max are exact; n_distinct is the HLL++
    * estimate ANALYZE recorded. A driver-side catalog read — no scan.
    */
  def planStats(spark: SparkSession, fq: String): DataFrame = {
    enableCbo(spark)
    val plan = spark.table(fq).queryExecution.optimizedPlan
    val st = plan.stats
    val rowCount = st.rowCount.map(_.toLong).getOrElse(
      throw new IllegalStateException(
        s"$fq has no row-count statistic — run registerAnalyzed first"))
    val byName: Map[String, ColumnStat] =
      st.attributeStats.toSeq.map { case (a, cs) => a.name -> cs }.toMap
    def num(v: Option[Any]): Option[Double] =
      v.map(_.toString.toDouble)
    val rows = byName.toSeq.sortBy(_._1).map { case (name, cs) =>
      Row(name, rowCount,
        cs.nullCount.map(_.toLong).getOrElse(null).asInstanceOf[Any],
        cs.distinctCount.map(_.toLong).getOrElse(null).asInstanceOf[Any],
        num(cs.min).getOrElse(null).asInstanceOf[Any],
        num(cs.max).getOrElse(null).asInstanceOf[Any])
    }
    val schema = StructType(Seq(
      StructField("col_name", StringType, nullable = false),
      StructField("row_count", LongType, nullable = false),
      StructField("null_count", LongType),
      StructField("n_distinct", LongType),
      StructField("min_val", DoubleType),
      StructField("max_val", DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }
}
