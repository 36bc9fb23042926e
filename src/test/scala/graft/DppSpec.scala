package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.queries.TierC
import graft.sources.Tables

/** Dynamic partition pruning over the date-partitioned fact layout:
  * q_dpp_join filters the date DIMENSION on a stored attribute, so the
  * fact's partition predicate only exists at runtime — the plan must
  * carry it as a DynamicPruningExpression in the fact scan's
  * PartitionFilters (join-driven pruning), not as a static literal and
  * not as a post-scan data filter.
  */
class DppSpec extends AnyFunSuite with SparkTestBase {

  test("q_dpp_join prunes fact partitions with a runtime dynamic filter") {
    val df = TierC.queries("q_dpp_join")(spark, sfDir)
    val factScans = df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec if f.partitionFilters.exists(
        _.references.exists(_.name == "event_date")) => f
    }
    assert(factScans.nonEmpty,
      s"no fact scan with an event_date partition filter:\n" +
        df.queryExecution.sparkPlan)
    assert(factScans.exists(_.partitionFilters.mkString.toLowerCase
        .contains("dynamicpruning")),
      "dimension filter did not become a dynamic partition-pruning " +
        s"filter on the fact scan:\n${df.queryExecution.sparkPlan}")
  }

  test("q_dpp_join result equals the statically-filtered computation") {
    val got = TierC.queries("q_dpp_join")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val want = Tables.events(spark, sfDir)
      .withColumn("event_date", to_date(col("ts")))
      .filter(dayofmonth(col("event_date")) % 7 === 3)
      .groupBy(col("event_date"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("total_value"))
      .orderBy(col("event_date"), col("event_type"))
      .collect().map(_.toSeq).toSeq
    assert(got == want)
  }
}
