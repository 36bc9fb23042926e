package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.NgramLm
import graft.sources.Tables

/** Bigram-LM document scoring (NgramLm): the rational pooled score is
  * pinned by hand-computed sufficient statistics on a tiny corpus
  * (the DuckDB oracle covers it at corpus scale — q_lm_score); the
  * log-space cross-entropy, which libm keeps outside the oracle
  * contract, is pinned EXACTLY against a sequential driver-side fold
  * in the same summation order.
  */
class LmSpec extends AnyFunSuite with SparkTestBase {

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("pooled score: hand-computed Laplace statistics on a toy corpus") {
    val ref = df(1L -> "the cat sat", 2L -> "the cat ran")
    // c12: "the cat"->2, "cat sat"->1, "cat ran"->1; c1: the=2 cat=2
    // sat=1 ran=1; V=4
    val out = NgramLm.score(
      df(10L -> "the cat sat", 11L -> "dog ate"), "doc_id", "text", ref)
      .orderBy(col("doc_id"))
      .select("doc_id", "n_bigrams", "n_unseen", "sum_num", "sum_den",
        "ppl_proxy")
      .collect()
    // doc 10: bigrams (the cat, cat sat): num (2+1)+(1+1)=5,
    // den (2+4)+(2+4)=12
    assert(out(0).toSeq === Seq(10L, 2L, 0L, 5L, 12L, 12.0 / 5.0))
    // doc 11: one unseen bigram, unseen history word: num 1, den 0+4
    assert(out(1).toSeq === Seq(11L, 1L, 1L, 1L, 4L, 4.0))
  }

  test("single-token and empty docs take the whole-text shingle path") {
    val ref = df(1L -> "alpha beta", 2L -> "alpha")
    // "alpha" is a 1-token doc: its sole "bigram" is the whole text —
    // trained once, so a scored copy finds c12=1, history c1(alpha)=2,
    // V=2
    val out = NgramLm.score(df(10L -> "alpha"), "doc_id", "text", ref)
      .select("n_bigrams", "n_unseen", "sum_num", "sum_den").collect()
    assert(out(0).toSeq === Seq(1L, 0L, 2L, 4L))
  }

  test("cross-entropy equals the sequential reference fold exactly") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"))
    val ref = docs.filter(col("lang") === "en")
    val got = NgramLm.crossEntropy(
      docs.filter(col("doc_id") < 50), "doc_id", "text", ref)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    // driver-side model in the same token/shingle semantics
    def toks(t: String): Array[String] =
      t.trim.split("\\s+").filter(_.nonEmpty)
    def bigrams(t: String): Array[String] = {
      val w = toks(t)
      if (w.length < 2) Array(w.mkString(" "))
      else w.sliding(2).map(_.mkString(" ")).toArray
    }
    val refTexts = ref.select("text").collect().map(_.getString(0))
    val c12 = refTexts.flatMap(bigrams)
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val c1 = refTexts.flatMap(toks)
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val v = c1.size.toLong
    val expected = docs.filter(col("doc_id") < 50)
      .select("doc_id", "text").collect().map { r =>
        val bs = bigrams(r.getString(1))
        val lps = bs.map { b =>
          val w1 = b.split(" ")(0)
          math.log((c12.getOrElse(b, 0L) + 1L).toDouble /
            (c1.getOrElse(w1, 0L) + v).toDouble)
        }.sorted
        r.getLong(0) -> (bs.length.toLong,
          -lps.foldLeft(0.0)(_ + _) / bs.length)
      }.toMap

    assert(got.keySet === expected.keySet)
    expected.foreach { case (id, (n, ce)) =>
      assert(got(id)._1 === n, s"doc $id bigram count")
      assert(got(id)._2 === ce, s"doc $id cross-entropy (exact)")
    }
  }

  test("familiar text scores lower than gibberish under both forms") {
    val ref = Tables.documents(spark, sfDir)
      .filter(col("lang") === "en").select(col("doc_id"), col("text"))
    val sample = ref.orderBy(col("doc_id")).limit(1)
      .collect()(0).getString(1)
    val probes = df(1L -> sample, 2L -> "zzq qxz jjw vvk zzq qxz pff")
    val pooled = NgramLm.score(probes, "doc_id", "text", ref)
      .orderBy(col("doc_id")).select("ppl_proxy").collect()
    assert(pooled(0).getDouble(0) < pooled(1).getDouble(0))
    val ce = NgramLm.crossEntropy(probes, "doc_id", "text", ref)
      .orderBy(col("doc_id")).select("cross_entropy").collect()
    assert(ce(0).getDouble(0) < ce(1).getDouble(0))
  }

  test("DSIR importance weights: the weight is exactly the ratio of " +
      "the two pooled estimates, target-like documents outweigh " +
      "off-domain ones, and resampling favors them") {
    import spark.implicits._
    // target domain repeats one bigram vocabulary; the raw pool mixes
    // it with an off-domain vocabulary
    val target = Seq((100L, "the cat sat"), (101L, "the cat ran"),
      (102L, "the cat sat"))
      .toDF("doc_id", "text")
    val offDomain = Seq((200L, "xs qq zz"), (201L, "qq zz xs"))
      .toDF("doc_id", "text")
    val raw = target.unionByName(offDomain)
    val probes = Seq((1L, "the cat sat"), (2L, "xs qq zz"))
      .toDF("doc_id", "text")
    val w = graft.operators.Dsir.weights(probes, "doc_id", "text",
      target, raw).orderBy(col("doc_id")).collect()
    // formula identity on every row: weight == (t_num·r_den)/(t_den·r_num)
    w.foreach { r =>
      val expect = (r.getAs[Long]("t_num").toDouble *
        r.getAs[Long]("r_den").toDouble) /
        (r.getAs[Long]("t_den").toDouble *
          r.getAs[Long]("r_num").toDouble)
      assert(r.getAs[Double]("weight") == expect, r.toString)
    }
    val byId = w.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Double]("weight")).toMap
    // the target-like probe is MORE likely under the target model
    // than the pool model (weight > 1); the off-domain probe less
    assert(byId(1L) > 1.0 && byId(2L) < 1.0, byId.toString)
    assert(byId(1L) > byId(2L))
    // resampling k=1 picks exactly the argmin of the deterministic
    // priority u(id)/weight — the composition is reproducible
    def u(id: Long): Double =
      (((id * 2654435761L) % 4294967296L).toDouble + 0.5) / 4294967296.0
    val expectWinner = byId.map { case (id, wt) => id -> u(id) / wt }
      .minBy(_._2)._1
    val picked = graft.operators.Dsir.resample(
      graft.operators.Dsir.weights(probes, "doc_id", "text",
        target, raw), "doc_id", 1).collect()
    assert(picked.length == 1 &&
      picked.head.getAs[Long]("doc_id") == expectWinner)
    // partition-layout independence: same weights at 1 partition
    val w1 = graft.operators.Dsir.weights(probes.repartition(7),
      "doc_id", "text", target.coalesce(1), raw.repartition(3))
      .orderBy(col("doc_id")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("weight"))
      .toMap
    assert(w1 == byId, s"$w1 vs $byId")
  }
}
