package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Upsert}

/** ScalaCheck differentials for the composed operators: each scalable
  * formulation (window sweep, ranking window) is checked against the
  * naive reference formulation (range join + argmax, per-key max
  * reduce) over ARBITRARY generated inputs — the properties run through
  * the engine, so they exercise the actual plans, not a Scala model.
  */
class OperatorPropSpec extends AnyFunSuite with SparkTestBase {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), p)
    assert(res.passed, res.status.toString)
  }

  // small key/time domains force collisions: ties, dense keys, keys on
  // one side only — the cases where a sweep and a join could diverge
  private val rowGen: Gen[(Long, Long, Long)] = for {
    key <- Gen.chooseNum(0L, 4L)
    ts <- Gen.chooseNum(0L, 20L)
    payload <- Gen.chooseNum(0L, 999L)
  } yield (key, ts, payload)

  test("property: as-of sweep equals naive range-join argmax") {
    import spark.implicits._
    val p = Prop.forAll(Gen.listOfN(30, rowGen), Gen.listOfN(30, rowGen)) {
      (lrows, rrows) =>
        // right side unique per (key, ts): the operator's documented
        // precondition (duplicate right timestamps are ambiguous)
        val rDistinct = rrows.groupBy(r => (r._1, r._2))
          .map(_._2.head).toSeq
        val left = lrows.zipWithIndex
          .map { case ((k, t, _), i) => (i.toLong, k, t) }
          .toDF("lid", "k", "t")
        val right = rDistinct.map { case (k, t, v) => (k, t, v) }
          .toDF("k", "rt", "payload")
        val swept = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt")
          .select("lid", "rt", "payload")
          .collect().map(_.toSeq).toSet
        val w = Window.partitionBy(col("lid"))
          .orderBy(col("rt").desc_nulls_last)
        val naive = left
          .join(right.withColumnRenamed("k", "rk"),
            col("k") === col("rk") && col("rt") <= col("t"), "left")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("lid", "rt", "payload")
          .collect().map(_.toSeq).toSet
        swept == naive
    }
    check(p)
  }

  test("property: latest-wins merge equals per-key argmax") {
    import spark.implicits._
    val p = Prop.forAll(Gen.listOfN(25, rowGen), Gen.listOfN(25, rowGen)) {
      (brows, urows) =>
        // make (key, version) unique across the union — the operator's
        // documented precondition (ambiguous winners fail loudly, tested
        // separately in OperatorsSpec)
        val all = (brows.map(r => (r._1, r._2, r._3, "b")) ++
          urows.map(r => (r._1, r._2, r._3, "u")))
          .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
        val base = all.filter(_._4 == "b").map(r => (r._1, r._2, r._3))
        val updates = all.filter(_._4 == "u").map(r => (r._1, r._2, r._3))
        if (base.isEmpty || updates.isEmpty) true
        else {
          val b = base.toDF("k", "version", "v")
          val u = updates.toDF("k", "version", "v")
          val merged = Upsert.latestWins(b, u, Seq("k"), "version")
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
            .toSet
          val expected = all.groupBy(_._1).map { case (_, rs) =>
            val win = rs.maxBy(_._2)
            (win._1, win._2, win._3)
          }.toSet
          merged == expected
        }
    }
    check(p)
  }

  test("property: fingerprint-counted repeated spans equal the " +
      "text-keyed reference") {
    import spark.implicits._
    // tiny vocabulary + short docs force heavy span sharing — the
    // regime where a fingerprint merge bug or a per-doc dedup miss
    // would surface
    val docGen: Gen[String] = Gen.chooseNum(3, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString(" ")))
    val p = Prop.forAll(Gen.listOfN(12, docGen)) { texts =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = graft.search.Ngrams.repeatedSpans(docs, "doc_id",
        "text", spanTokens = 3, minDocs = 2, topK = 1000)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      // reference: plain Scala over the same tokenization
      val expect = texts.zipWithIndex
        .flatMap { case (t, i) =>
          val toks = t.trim.split("\\s+").filter(_.nonEmpty)
          toks.sliding(3).filter(_.length == 3).map(_.mkString(" "))
            .toSeq.distinct.map(s => (s, i))
        }
        .groupBy(_._1).view.mapValues(_.size.toLong)
        .filter(_._2 >= 2L).toSeq
        .sortBy { case (s, n) => (-n, s) }
      got == expect
    }
    check(p)
  }

  test("property: rrf fusion equals the per-id reciprocal-rank model") {
    import spark.implicits._
    val runGen: Gen[List[(Long, Double)]] = Gen.listOfN(8, for {
      id <- Gen.chooseNum(0L, 5L)
      s <- Gen.chooseNum(0, 9).map(_ / 10.0) // coarse scores force ties
    } yield (id, s)).map(_.groupBy(_._1).map(_._2.head).toList)
    // listOfN(8, ·) keyed to ≤6 ids always leaves ≥1 row per run, so
    // no emptiness implication is needed
    val p = Prop.forAll(runGen, runGen) { (ra, rb) =>
      {
        val fused = graft.search.Fusion.rrf(
          Seq(("a", ra.toDF("id", "s"), "s"),
            ("b", rb.toDF("id", "s"), "s")), "id")
          .collect()
          .map(r => r.getAs[Long]("id") -> r.getAs[Double]("rrf_score"))
        def ranks(run: List[(Long, Double)]): Map[Long, Long] =
          run.sortBy { case (id, s) => (-s, id) }.zipWithIndex
            .map { case ((id, _), i) => id -> (i + 1L) }.toMap
        val (rka, rkb) = (ranks(ra), ranks(rb))
        val model = (rka.keySet ++ rkb.keySet).map { id =>
          id -> (rka.get(id).map(r => 1.0 / (60.0 + r)).getOrElse(0.0) +
            rkb.get(id).map(r => 1.0 / (60.0 + r)).getOrElse(0.0))
        }.toMap
        fused.toMap == model &&
          // best-first with id tiebreak, total order
          fused.toSeq == fused.toSeq.sortBy { case (id, s) => (-s, id) }
      }
    }
    check(p)
  }

  test("property: WAV encode/decode round-trip over arbitrary seeds " +
      "(negatives included) matches the seed formulas and sine bounds") {
    import graft.functions.{WavDecode, WavEncode}
    val p = Prop.forAll(Gen.chooseNum(Long.MinValue + 1, Long.MaxValue)) {
      seed =>
        val row = WavDecode.compute(WavEncode.compute(seed))
        val amp = WavEncode.ampOf(seed)
        row != null &&
          row.getInt(0) == WavEncode.SampleRate &&
          row.getLong(1) == WavEncode.nSamplesOf(seed) &&
          math.abs(row.getDouble(2) - amp / math.sqrt(2.0)) < 0.05 &&
          row.getDouble(3) <= amp + 1.0 / 32767 &&
          row.getDouble(3) > amp * 0.9
    }
    check(p)
  }

  test("property: string ordinate is monotone w.r.t. UTF-8 byte order") {
    import graft.sources.ZOrder
    import org.apache.spark.sql.types.StringType
    import spark.implicits._
    def byteKey(s: String): String =
      s.getBytes("UTF-8").map(b => f"${b & 0xff}%03d").mkString(",")
    val strGen = Gen.listOfN(25, Gen.oneOf(
      Gen.asciiPrintableStr.map(_.take(12)),
      Gen.listOfN(6, Gen.oneOf('a', 'z', 'é', '世', '0', ' '))
        .map(_.mkString)))
    val p = Prop.forAll(strGen) { ss =>
      val df = ss.toDF("s")
        .select(col("s"), ZOrder.ordinate(col("s"), StringType).as("o"))
      val got = df.collect().map(r => r.getString(0) -> r.getDouble(1))
      val sorted = got.sortBy(x => (byteKey(x._1), x._1))
      sorted.map(_._2).toSeq.sliding(2).forall {
        case Seq(a, b) => a <= b
        case _ => true
      }
    }
    check(p)
  }

  test("property: n-dim Morton interleave deinterleaves back to its " +
      "inputs for 1-4 dimensions") {
    import graft.sources.ZOrder
    import spark.implicits._
    val dimsGen = for {
      n <- Gen.chooseNum(1, 4)
      bits = ZOrder.bitsFor(n)
      rows <- Gen.listOfN(20,
        Gen.listOfN(n, Gen.chooseNum(0L, (1L << bits) - 1)))
    } yield (n, bits, rows)
    val p = Prop.forAll(dimsGen) { case (n, bits, rows) =>
      val df = rows.map(r => Tuple1(r)).toDF("qs")
      val z = ZOrder.zValueN(
        (0 until n).map(i => element_at(col("qs"), i + 1)), bits)
      val back = df.select(col("qs"), z.as("z")).collect().map { r =>
        val qs = r.getSeq[Long](0)
        val zv = r.getLong(1)
        // extract dim d: bit i of dim d sits at position i*n + d
        val deco = (0 until n).map { d =>
          (0 until bits).map(i => ((zv >> (i * n + d)) & 1L) << i).sum
        }
        qs == deco
      }
      back.forall(identity)
    }
    check(p)
  }

  test("property: prefix-filtered edit-distance self-join equals the " +
      "naive quadratic reference (filter losslessness)") {
    import spark.implicits._
    import graft.operators.EditSimilarity
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j), dp(i)(j - 1)) + 1,
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    // tiny alphabet + short strings force collisions, hot grams, and
    // the short-string fallback paths all at once
    val strGen = Gen.listOfN(30, for {
      n <- Gen.chooseNum(0, 10)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString)
    val p = Prop.forAll(strGen, Gen.oneOf(1, 2)) { (ss, d) =>
      val df = ss.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("id", "s")
      val got = EditSimilarity.selfJoin(df, "id", "s", d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSet
      val expect = (for {
        (a, i) <- ss.zipWithIndex
        (b, j) <- ss.zipWithIndex
        if i < j
        dist = lev(a, b)
        if dist <= d
      } yield (i.toLong, j.toLong, dist)).toSet
      got == expect
    }
    check(p)
  }

  test("property: prefix-filtered exact Jaccard join equals brute " +
      "force (filter losslessness incl. the float-ceil edge)") {
    import spark.implicits._
    import graft.operators.SetSimilarity
    val recGen = Gen.listOfN(22, Gen.chooseNum(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e"))))
    val p = Prop.forAll(recGen, Gen.oneOf(0.3, 0.5, 0.6, 0.8)) {
      (rows, t) =>
        val df = rows.zipWithIndex
          .map { case (ts, i) => (i.toLong, ts) }.toDF("id", "toks")
        val got = SetSimilarity
          .jaccardSelfJoin(df, "id", col("toks"), t)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3))).toSet
        val sets = rows.map(_.toSet)
        val expect = (for {
          i <- sets.indices; j <- sets.indices
          if i < j && sets(i).nonEmpty && sets(j).nonEmpty
          inter = (sets(i) & sets(j)).size
          uni = (sets(i) | sets(j)).size
          if inter.toDouble / uni >= t
        } yield (i.toLong, j.toLong, inter.toLong, uni.toLong)).toSet
        got == expect
    }
    check(p)
  }

  test("merge plan is one ranking window, never a join") {
    import spark.implicits._
    val b = Seq((1L, 1L, 10L)).toDF("k", "version", "v")
    val u = Seq((1L, 2L, 20L)).toDF("k", "version", "v")
    val plan = Upsert.latestWins(b, u, Seq("k"), "version")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"expected a ranking window:\n$plan")
    assert(!plan.contains("Join"),
      s"latest-wins must not plan a join:\n$plan")
  }

  test("property: substrDedup equals a brute-force token-level " +
      "reference over arbitrary tiny-vocab corpora") {
    import spark.implicits._
    val k = 3
    // 3-word vocab + doc lengths 0..10 force dense window collisions
    // within AND across documents — exactly where the one-pass window
    // formulation could diverge from first-occurrence semantics
    val docGen: Gen[String] = for {
      n <- Gen.chooseNum(0, 10)
      ws <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
    } yield ws.mkString(" ")
    def reference(docs: Seq[(Long, String)])
        : Map[Long, (Long, Long, String)] = {
      val toks = docs.map { case (id, t) =>
        id -> t.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
      // corpus-order-first occurrence per window content
      val seen = scala.collection.mutable.Map[Seq[String], (Long, Int)]()
      val hits = scala.collection.mutable
        .Map[Long, Set[Int]]().withDefaultValue(Set.empty)
      docs.sortBy(_._1).foreach { case (id, _) =>
        val ts = toks(id)
        (0 to ts.length - k).foreach { i =>
          val w = ts.slice(i, i + k)
          seen.get(w) match {
            case None => seen(w) = (id, i)
            case Some(_) => hits(id) = hits(id) ++ (i until i + k).toSet
          }
        }
      }
      docs.map { case (id, _) =>
        val ts = toks(id)
        val cov = hits(id)
        id -> ((ts.length.toLong, cov.size.toLong,
          ts.zipWithIndex.collect {
            case (t, i) if !cov(i) => t }.mkString(" ")))
      }.toMap
    }
    val p = Prop.forAll(Gen.listOfN(6, docGen)) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = graft.dedup.Dedup
        .substrDedup(docs.toDF("doc_id", "text"), "doc_id", "text", k)
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      got == reference(docs)
    }
    check(p)
  }
}
