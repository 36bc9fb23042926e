package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Bucketing, Skew}
import graft.sources.Tables

class OperatorsSpec extends AnyFunSuite with SparkTestBase {

  test("bucketed join runs with no shuffle exchange under the join") {
    val o = Bucketing.ensureBucketed(spark, Tables.orders(spark, sfDir),
      "bkt_test_orders", "o_orderkey")
    val l = Bucketing.ensureBucketed(spark, Tables.lineitem(spark, sfDir),
      "bkt_test_lineitem", "l_orderkey")
    val joined = o.hint("merge")
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority")).count()
    val plan = joined.queryExecution.executedPlan.toString
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, s"expected sort-merge join:\n$plan")
    // no Exchange below the join (bucketed layout pre-shuffled both sides)
    assert(!plan.substring(joinIdx).contains("Exchange"),
      s"bucketed join still shuffles:\n$plan")
    // and the result matches the plain (shuffling) join
    val plain = Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority")).count()
    assert(joined.collect().map(_.toSeq).toSet ==
      plain.collect().map(_.toSeq).toSet)
  }

  test("salted aggregation equals the direct aggregation") {
    import spark.implicits._
    val df = Tables.events(spark, sfDir)
      .select($"event_type", $"value".cast("decimal(18,2)").as("v"))
    val salted = Skew.saltedCountSum(df, "event_type", "v", salts = 16)
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    val direct = df.groupBy($"event_type")
      .agg(count(lit(1)).as("cnt"), sum($"v").as("total"),
        min($"v").as("min_v"), max($"v").as("max_v"))
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    assert(salted == direct)
    assert(salted.nonEmpty)
  }

  test("salted join equals the plain join, spread over salt partitions") {
    import spark.implicits._
    // skewed left: one hot key
    val left = ((1 to 500).map(_ => ("hot", 1)) ++
      Seq(("cold", 2), ("cool", 3))).toDF("k", "v")
    val right = Seq(("hot", "H"), ("cold", "C")).toDF("k", "tag")
    val salted = Skew.saltedJoin(left, right, "k", salts = 8)
      .select("k", "v", "tag")
    val plain = left.join(right, "k").select("k", "v", "tag")
    assert(salted.collect().map(_.toSeq).groupBy(identity).view
      .mapValues(_.length).toMap ==
      plain.collect().map(_.toSeq).groupBy(identity).view
        .mapValues(_.length).toMap)
    assert(salted.count() == 501) // 500 hot + 1 cold
  }
}
