package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Bucketing, Skew}
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

  test("as-of join: at-or-before match, per-key isolation, left nulls") {
    import spark.implicits._
    val trades = Seq(
      ("A", 5L, 100.0),   // before any quote -> null
      ("A", 10L, 101.0),  // tie with quote at 10 -> sees it ("at or before")
      ("A", 12L, 102.0),  // between quotes -> still the t=10 quote
      ("A", 50L, 103.0),  // after the t=20 quote
      ("B", 15L, 200.0))  // key B only sees B quotes
      .toDF("sym", "t", "px")
    val quotes = Seq(
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("B", 11L, 9.0))
      .toDF("sym", "qt", "bid")
    val out = AsOfJoin.asOf(trades, quotes, Seq("sym"), "t", "qt")
      .orderBy("sym", "t")
      .collect()
      .map(r => (r.getAs[String]("sym"), r.getAs[Long]("t"),
        Option(r.getAs[Any]("qt")), Option(r.getAs[Any]("bid"))))
    assert(out.toSeq == Seq(
      ("A", 5L, None, None),
      ("A", 10L, Some(10L), Some(1.0)),
      ("A", 12L, Some(10L), Some(1.0)),
      ("A", 50L, Some(20L), Some(2.0)),
      ("B", 15L, Some(11L), Some(9.0))))
    // the plan is a single window sweep, not a join: no pair explosion
    val plan = AsOfJoin.asOf(trades, quotes, Seq("sym"), "t", "qt")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"expected a window sweep:\n$plan")
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    // a NULL payload field in the matched row stays NULL (struct carry):
    // the older non-null value must NOT leak forward
    val qn = Seq(("A", 10L, Some(1.0)), ("A", 20L, None))
      .toDF("sym", "qt", "bid")
    val leaked = AsOfJoin.asOf(trades, qn, Seq("sym"), "t", "qt")
      .filter($"t" === 50L).collect().head
    assert(leaked.getAs[Long]("qt") == 20L)
    assert(leaked.isNullAt(leaked.fieldIndex("bid")),
      "null payload in matched row must stay null, not carry the t=10 value")
  }

  test("as-of join: NULL keys follow equality-join semantics") {
    import spark.implicits._
    // a NULL-keyed right row must match NOTHING (an equality join never
    // matches NULLs); a NULL-keyed left row is kept, unenriched
    val trades = Seq((Option("A"), 10L, 1.0), (Option.empty[String], 10L, 2.0))
      .toDF("sym", "t", "px")
    val quotes = Seq((Option("A"), 5L, 7.0), (Option.empty[String], 5L, 8.0))
      .toDF("sym", "qt", "bid")
    val out = AsOfJoin.asOf(trades, quotes, Seq("sym"), "t", "qt")
      .collect()
      .map(r => (Option(r.getAs[String]("sym")),
        Option(r.getAs[Any]("bid")))).toSet
    assert(out == Set(
      (Some("A"), Some(7.0)),   // real key matches its quote
      (None, None)),            // NULL key must NOT see the NULL-keyed quote
      s"unexpected: $out")
  }

  test("as-of join equals the naive range-join argmax on real events") {
    import org.apache.spark.sql.expressions.Window
    // differential check on testdata: the window-sweep formulation must
    // equal the quadratic range-join + per-left argmax it replaces
    val ev = Tables.events(spark, sfDir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("v_ts"),
        col("value").as("v_value"))
    val sweep = AsOfJoin.asOf(p, v, Seq("user_id"), "ts", "v_ts")
      .select("event_id", "v_ts", "v_value")
      .collect().map(_.toSeq).toSet
    val w = Window.partitionBy(col("event_id"))
      .orderBy(col("v_ts").desc_nulls_last)
    val naive = p
      .join(v.withColumnRenamed("user_id", "v_user"),
        col("user_id") === col("v_user") &&
          col("v_ts") <= col("ts"), "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("event_id", "v_ts", "v_value")
      .collect().map(_.toSeq).toSet
    assert(sweep.nonEmpty)
    assert(sweep == naive)
  }

  test("latest-wins merge: upserts, inserts, tombstones, ambiguity") {
    import spark.implicits._
    import graft.operators.Upsert
    val base = Seq((1L, "a", 1L, false), (2L, "b", 1L, false))
      .toDF("k", "v", "version", "deleted")
    val updates = Seq(
      (2L, "b2", 2L, false),  // update wins over base
      (3L, "c", 2L, false),   // fresh insert
      (1L, "a", 2L, true))    // tombstone removes key 1
      .toDF("k", "v", "version", "deleted")
    val out = Upsert.latestWins(base, updates, Seq("k"), "version",
        deletedCol = Some("deleted"))
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("v"))
      .toMap
    assert(out == Map(2L -> "b2", 3L -> "c"))
    // a duplicate WINNING version for one key is ambiguous in any
    // engine: the merge must fail loudly, never pick a row
    val dup = Seq((9L, "x", 5L, false), (9L, "y", 5L, false))
      .toDF("k", "v", "version", "deleted")
    val err = intercept[Exception] {
      Upsert.latestWins(base, dup, Seq("k"), "version").collect()
    }
    assert(err.getMessage != null)
    // a tie on a SUPERSEDED version is harmless
    val old = Seq((2L, "b_old", 1L, false)).toDF("k", "v", "version",
      "deleted")
    val ok = Upsert.latestWins(base.union(old), updates, Seq("k"),
        "version", deletedCol = Some("deleted"))
      .filter($"k" === 2L).collect()
    assert(ok.length == 1 && ok.head.getAs[String]("v") == "b2")
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

  test("packBins distributed prefix sum matches the single-partition " +
      "reference across partition boundaries") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // token counts chosen so bins straddle partition boundaries under
    // any range partitioning of the 32 shuffle partitions
    val docs = (0L until 500L).map(i => (i, (i * 37 % 90 + 1).toInt))
      .toDF("id", "tok")
    val got = graft.operators.Packing
      .packBins(docs, Seq($"id"), $"tok", budget = 100L,
        partitions = Some(8))
      .select($"id", $"_start", $"bin_id")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .toMap
    // reference: the textbook exclusive running sum on one partition
    val ref = docs.withColumn("s",
        coalesce(sum($"tok").over(Window.orderBy($"id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"id", $"s")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 500)
    ref.foreach { case (id, s) =>
      assert(got(id) == ((s, s / 100)),
        s"id=$id: got ${got(id)}, expected start=$s bin=${s / 100}")
    }
    // and it genuinely ran distributed: the pinned range exchange keeps
    // its 8 partitions, so the offsets path was exercised
    assert(docs.repartitionByRange(8, $"id").rdd.getNumPartitions == 8)
  }

  test("packBins staged run matches the unstaged result exactly") {
    import spark.implicits._
    val docs = (0L until 300L).map(i => (i, (i * 13 % 50 + 1).toInt))
      .toDF("id", "tok")
    val dir = java.nio.file.Files
      .createTempDirectory("pack_stage").toFile.getAbsolutePath
    def run(stage: Option[String]) = graft.operators.Packing
      .packBins(docs, Seq($"id"), $"tok", budget = 64L,
        partitions = Some(8), stagingDir = stage)
      .select($"id", $"_start", $"bin_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(run(Some(dir)) == run(None))
    // the staged copy landed under the asked-for prefix (packBins
    // suffixes the path with its preparation-recipe hash)
    val staged = stagedDirsUnder(dir)
    assert(staged.nonEmpty, s"no staged dir committed under $dir-*")
    assert(staged.exists(_.listFiles.exists(
      _.getName.endsWith(".parquet"))))
  }

  /** Committed staging dirs packBins created for base path `base` —
    * `base`-prefixed siblings carrying the recipe-hash suffix.
    */
  private def stagedDirsUnder(base: String): Seq[java.io.File] = {
    val f = new java.io.File(base)
    Option(f.getParentFile.listFiles).toSeq.flatten
      .filter(d => d.isDirectory && d.getName.startsWith(f.getName + "-"))
  }

  test("packBins staging key tracks the preparation recipe: same " +
      "source, changed transform -> a fresh stage, not stale reuse; " +
      "changed budget -> the stage is reused") {
    import spark.implicits._
    val docs = (0L until 100L).map(i => (i, (i % 9 + 1).toInt))
      .toDF("id", "tok")
    val dir = java.nio.file.Files
      .createTempDirectory("pack_key").toFile.getAbsolutePath
    def run(tok: org.apache.spark.sql.Column, budget: Long) =
      graft.operators.Packing.packBins(docs, Seq($"id"), tok, budget,
        partitions = Some(4), stagingDir = Some(dir))
        .write.format("noop").mode("overwrite").save()
    run($"tok", 64L)
    assert(stagedDirsUnder(dir).size == 1)
    // budget is not part of the staged rows: same stage serves both
    run($"tok", 32L)
    assert(stagedDirsUnder(dir).size == 1,
      "budget change must reuse the stage")
    // a different token expression is a different recipe: the old stage
    // must NOT be trusted (this was the stale-cache bug)
    run($"tok" * 2, 64L)
    assert(stagedDirsUnder(dir).size == 2,
      "transform change silently reused a stale stage")
  }

  test("packBins staging commit is atomic: a torn (uncommitted) dir is " +
      "rebuilt, not trusted") {
    import spark.implicits._
    val docs = (0L until 50L).map(i => (i, 1)).toDF("id", "tok")
    val dir = java.nio.file.Files
      .createTempDirectory("pack_torn").toFile.getAbsolutePath
    def run() = graft.operators.Packing
      .packBins(docs, Seq($"id"), $"tok", 16L, partitions = Some(2),
        stagingDir = Some(dir))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1))).collect()(0).getLong(0)
    assert(run() == 50L)
    val staged = stagedDirsUnder(dir).head
    // simulate a pre-rename-commit crash: dir present, no _SUCCESS
    assert(new java.io.File(staged, "_SUCCESS").delete())
    assert(run() == 50L, "torn stage corrupted the result")
    assert(new java.io.File(staged, "_SUCCESS").exists(),
      "stage was not recommitted")
  }

  test("packBins with a committed staging dir reads ONLY the staged " +
      "parquet — the declared-query scale path scans the source once") {
    import spark.implicits._
    val src = java.nio.file.Files
      .createTempDirectory("pack_src").toFile.getAbsolutePath
    (0L until 200L).map(i => (i, (i * 7 % 40 + 1).toInt))
      .toDF("id", "tok").write.mode("overwrite").parquet(src)
    val docs = spark.read.parquet(src)
    val dir = java.nio.file.Files
      .createTempDirectory("pack_stage2").toFile.getAbsolutePath
    def build() = graft.operators.Packing
      .packBins(docs, Seq($"id"), $"tok", budget = 64L,
        partitions = Some(4), stagingDir = Some(dir))
    build().write.format("noop").mode("overwrite").save() // materialize
    val stageDir = stagedDirsUnder(dir).head
    assert(new java.io.File(stageDir, "_SUCCESS").exists())
    val staged = stageDir.listFiles
      .filter(_.getName.endsWith(".parquet"))
    val mtimes = staged.map(f => f.getName -> f.lastModified).toMap
    // second build: _SUCCESS is trusted, nothing is rewritten...
    val reused = build()
    assert(stageDir.listFiles
      .filter(_.getName.endsWith(".parquet"))
      .forall(f => mtimes.get(f.getName).contains(f.lastModified)),
      "staged files were rewritten on reuse")
    // ...and every file source in the whole plan (running total AND
    // offsets side) is the staged parquet — the original source path
    // appears nowhere, so the source was scanned exactly once, at
    // staging time
    import org.apache.spark.sql.execution.datasources.{
      HadoopFsRelation, LogicalRelation}
    val roots = reused.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation
    }.collect { case r: HadoopFsRelation =>
      r.location.rootPaths.map(_.toString)
    }.flatten
    assert(roots.nonEmpty)
    assert(roots.forall(_.contains(new java.io.File(dir).getName)),
      s"plan reads outside the staging dir: $roots")
    assert(!roots.exists(_.contains(new java.io.File(src).getName)))
  }

  test("staged groupOverlap reads only the staged parquet and matches " +
      "the unstaged result") {
    import spark.implicits._
    val docs = Seq(("g1", "x y z w"), ("g2", "x y z"), ("g3", "p q r"),
      ("g3", "x y z p q")).toDF("source", "text")
    val dir = new java.io.File(
      "target/test-overlap-staging/" + System.nanoTime()).getAbsolutePath
    val staged = graft.search.Ngrams.groupOverlap(docs, "source", "text",
      stagingDir = Some(dir))
    val fresh = graft.search.Ngrams.groupOverlap(docs, "source", "text")
    assert(staged.orderBy($"group_a", $"group_b").collect().toSeq ==
      fresh.orderBy($"group_a", $"group_b").collect().toSeq)
    // every file source in the staged plan is the staged parquet — the
    // corpus was scanned and shingled exactly once, at staging time
    import org.apache.spark.sql.execution.datasources.{
      HadoopFsRelation, LogicalRelation}
    val roots = staged.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation
    }.collect { case r: HadoopFsRelation =>
      r.location.rootPaths.map(_.toString)
    }.flatten
    assert(roots.nonEmpty)
    assert(roots.forall(_.contains(new java.io.File(dir).getName)),
      s"plan reads outside the staging dir: $roots")
  }

  test("train-shuffle scramble matches BigInt beyond the 64-bit wrap") {
    import spark.implicits._
    // ids where doc_id * 2654435761 overflows a signed 64-bit product —
    // the naive formula silently wraps there; the split-modmul form must
    // agree with exact wide-integer arithmetic
    val ids = Seq(0L, 1L, 12345L, (1L << 31) - 1, 1L << 32,
      (1L << 33) + 7L, 3L << 40, Long.MaxValue / 3)
    val got = ids.toDF("doc_id")
      .select($"doc_id",
        graft.queries.TierC.trainShuffleKey($"doc_id").as("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { id =>
      val expect = ((BigInt(id) % BigInt(2).pow(32)) * BigInt(2654435761L) %
        BigInt(2).pow(32)).toLong
      assert(got(id) == expect,
        s"id=$id: got ${got(id)}, BigInt reference $expect")
    }
  }

  test("priority sampling: exact Scala-reference priorities, " +
      "weight-proportional inclusion, top-k plan (no global sort)") {
    import spark.implicits._
    import graft.operators.Sampling
    // deterministic exactness against a BigInt/Double reference
    def uRef(id: Long): Double =
      (((BigInt(id) * BigInt(2654435761L)) mod BigInt(2).pow(32))
        .toLong + 0.5) / 4294967296.0
    val rows = (0L until 200L).map(id => (id, 1L + id % 7))
    val df = rows.toDF("doc_id", "w")
    val got = Sampling.prioritySample(df, "doc_id", col("w"), 20)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val expect = rows
      .map { case (id, w) => (id, uRef(id) / w.toDouble) }
      .sortBy { case (id, p) => (p, id) }.take(20)
    assert(got.toSeq == expect, s"got ${got.take(3).toSeq}")
    // weight-proportional inclusion: one heavy row among uniform light
    // rows is sampled ~always; the same row with the light weight
    // follows its plain uniform rank
    val heavy = (0L until 1000L).map(id =>
      (id, if (id == 777L) 100000L else 1L)).toDF("doc_id", "w")
    val picked = Sampling.prioritySample(heavy, "doc_id", col("w"), 10)
      .collect().map(_.getLong(0)).toSet
    assert(picked.contains(777L), "heavy row must be sampled")
    // top-k plans as TakeOrdered (per-partition heaps), never a sort
    val plan = Sampling.prioritySample(df, "doc_id", col("w"), 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // the strictly-positive weight contract is ENFORCED in-plan: a
    // zero or negative weight fails loudly instead of silently
    // dominating the sample with Inf/negative priorities
    def chainText(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    val bad = Seq((1L, 1L), (2L, 0L), (3L, 2L)).toDF("doc_id", "w")
    val e = intercept[Exception] {
      Sampling.prioritySample(bad, "doc_id", col("w"), 3).collect()
    }
    assert(chainText(e).contains("strictly positive"), chainText(e))
    val neg = Seq((1L, 1L), (2L, -5L)).toDF("doc_id", "w")
    val e2 = intercept[Exception] {
      Sampling.prioritySample(neg, "doc_id", col("w"), 2).collect()
    }
    assert(chainText(e2).contains("strictly positive"), chainText(e2))
  }

  test("PageRank: exact integer recurrence on a hand-computed path " +
      "graph; endpoints symmetric; bad damping refused") {
    import spark.implicits._
    import graft.operators.PageRank
    // path graph 1 - 2 - 3 (symmetric edges): outdeg 1,2,1
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    // iter1: c(2)=1e9+1e9, c(1)=c(3)=5e8
    //   r1 = (15e9 + 85*c) div 100 -> 575e6 / 1.85e9 / 575e6
    // iter2: c(2)=2*575e6, c(1)=c(3)=925e6
    //   r2 -> 936,250,000 / 1,127,500,000 / 936,250,000
    val r = PageRank.run(edges, iters = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === Map(1L -> 936250000L, 2L -> 1127500000L,
      3L -> 936250000L))
    // symmetric endpoints agree exactly (a float PageRank would only
    // agree within rounding)
    assert(r(1L) === r(3L))
    intercept[IllegalArgumentException] { PageRank.run(edges, 0) }
    intercept[IllegalArgumentException] {
      PageRank.run(edges, 1, dampNum = 100, dampDen = 100)
    }
  }
}
