package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Runtime bloom-filter join pruning — the ROW-level sibling of dynamic
  * partition pruning (DppSpec): when a selective dimension filter joins
  * a fact on a NON-partition column, Catalyst can build a bloom filter
  * from the dimension side at runtime and push `might_contain` into the
  * fact scan, cutting the shuffled fact rows to roughly the join's
  * output size. At 100 TB this is the difference between shuffling the
  * whole fact table and shuffling the matching fraction. Thresholds are
  * lowered here because the mechanism is size-gated (it only pays for
  * itself on big scans); the assertion is on the PLAN, which is
  * identical at any scale.
  */
class RuntimeFilterSpec extends AnyFunSuite with SparkTestBase {

  test("AQE splits a skewed join partition at runtime") {
    import spark.implicits._
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.forceOptimizeSkewedJoin")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      // shrink the thresholds so the planted hot key qualifies at test
      // scale; the mechanism (runtime re-plan splitting one oversized
      // shuffle partition into parallel sub-reads) is scale-invariant.
      // forceOptimizeSkewedJoin: the downstream global agg repartitions
      // anyway, and the guard against introducing that extra shuffle
      // would otherwise veto the split at this toy size.
      conf.set(keys(0), "16KB")
      conf.set(keys(1), "4KB")
      conf.set(keys(2), "2")
      conf.set(keys(3), "-1")
      conf.set(keys(4), "true")
      // plant the hot key: 80% of rows land on k=0. Two traps this test
      // documents: the payload must be INCOMPRESSIBLE (partition stats
      // are post-compression bytes — a constant pad compresses to
      // nothing) and must be REFERENCED downstream (column pruning
      // would otherwise drop it before the shuffle, and an 8-byte key
      // stream never looks skewed).
      val left = spark.range(0, 20000)
        .select(when(col("id") % 5 =!= 0, lit(0L))
          .otherwise(col("id") % 1000).as("k"),
          sha2(concat(lit("pad"), col("id").cast("string")), 256)
            .as("payload"))
      val right = spark.range(0, 1000).select(col("id").as("rk"),
        lit(1L).as("w"))
      val joined = left.join(right, col("k") === col("rk"))
        .agg(count(lit(1)).as("cnt"), max(col("payload")).as("mx"))
      val n = joined.collect().head.getLong(0)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$finalPlan")
      assert(n == 20000L, s"skew-split join changed the result: $n")
    } finally {
      keys.zip(saved).foreach { case (k, (_, v)) =>
        v.fold(conf.unset(k))(conf.set(k, _)) }
    }
  }

  test("selective dim filter becomes a bloom runtime filter on the fact") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set(keys(0), "10GB")   // creation side may be up to this big
      conf.set(keys(1), "0")      // apply even to tiny scans (test scale)
      conf.set(keys(2), "-1")     // force a shuffle join: bloom filters
                                  // target the pre-shuffle fact scan
      val orders = Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT")
      val li = Tables.lineitem(spark, sfDir)
      val joined = li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter_agg") ||
        plan.contains("might_contain"),
        s"no runtime bloom filter in the optimized plan:\n$plan")
      // the filter is a pure pruning optimization: results are identical
      // to the unfiltered-plan run (checked against the default config)
      val got = joined.collect().map(_.toSeq).toSet
      keys.zip(saved).foreach { case (k, (_, v)) =>
        v.fold(conf.unset(k))(conf.set(k, _)) }
      val want = li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"))
        .collect().map(_.toSeq).toSet
      assert(got == want && got.nonEmpty)
    } finally {
      keys.zip(saved).foreach { case (k, (_, v)) =>
        v.fold(conf.unset(k))(conf.set(k, _)) }
    }
  }
}
