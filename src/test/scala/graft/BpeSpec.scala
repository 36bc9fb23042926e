package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** BPE trainer/encoder correctness: the distributed implementation is
  * pinned against an INDEPENDENT sequential reference (written from
  * the Sennrich 2016 algorithm statement, sharing no code with the
  * operator) on both a hand corpus and the real sf0.001 documents —
  * merge sequence, final vocabulary and per-doc token counts all
  * bit-equal. The reference is the oracle here because the merge loop
  * is iterative-global-argmax, which single-pass SQL cannot express;
  * the FIRST iteration's pair counts are separately DuckDB
  * hash-checked via q_bpe_pairs.
  */
class BpeSpec extends AnyFunSuite with SparkTestBase {

  // ---- sequential reference (Sennrich 2016, test-only) ----

  private def refMergeWord(s: List[String], l: String,
      r: String): List[String] =
    s.foldLeft(List.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == l && x == r)
        acc.init :+ (l + r)
      else acc :+ x
    }

  private def refTrain(wordCounts: Map[String, Long], numMerges: Int)
      : (List[(String, String)], Map[String, List[String]]) = {
    var words: Map[String, (List[String], Long)] = wordCounts.map {
      case (w, c) => w -> (w.map(_.toString).toList :+ "</w>", c)
    }
    var merges = List.empty[(String, String)]
    var stop = false
    while (merges.length < numMerges && !stop) {
      val pairs = scala.collection.mutable.Map[(String, String), Long]()
      for ((_, (syms, c)) <- words; p <- syms.zip(syms.tail))
        pairs(p) = pairs.getOrElse(p, 0L) + c
      val eligible = pairs.filter(_._2 >= 2)
      if (eligible.isEmpty) stop = true
      else {
        // max count, ties to the lexicographically smallest (l, r)
        val best = eligible.toSeq
          .sortBy { case ((l, r), c) => (-c, l, r) }.head._1
        merges :+= best
        words = words.map { case (w, (syms, c)) =>
          w -> (refMergeWord(syms, best._1, best._2), c)
        }
      }
    }
    (merges, words.map { case (w, (syms, _)) => w -> syms })
  }

  private def refWordCounts(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }

  // ---- hand corpus: the distributed trainer matches the reference ----

  test("BPE merge application is greedy left-to-right") {
    import spark.implicits._
    val out = Seq(Tuple1(Seq("a", "a", "a", "</w>"))).toDF("syms")
      .select(Bpe.applyMerge(col("syms"), "a", "a").as("m"))
      .collect().head.getAs[scala.collection.Seq[String]]("m")
    assert(out == Seq("aa", "a", "</w>"),
      s"leftmost-first merge violated: $out")
  }

  test("hand corpus: merge sequence and vocabulary match the " +
      "sequential reference") {
    import spark.implicits._
    val texts = Seq("low low low lower lower newest newest newest",
      "newest newest newest widest widest widest low low")
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val (merges, vocab) = Bpe.train(docs, "text", 12)
    val (refMerges, refVocab) = refTrain(refWordCounts(texts), 12)
    assert(merges.map(m => (m._2, m._3)) == refMerges,
      s"merge sequences differ: $merges vs $refMerges")
    val gotVocab = vocab.collect().map(r =>
      r.getAs[String]("word") ->
        r.getAs[scala.collection.Seq[String]]("tokens").toList).toMap
    assert(gotVocab == refVocab)
    // the classic sanity: the most frequent word ends fully merged
    assert(gotVocab("newest") == List("newest</w>"))
  }

  test("sf0.001 documents: merges, vocabulary and token counts match " +
      "the reference; persisted build is reproducible") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val texts = docs.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val (refMerges, refVocab) =
      refTrain(refWordCounts(texts.map(_._2).toSeq), 30)

    def run(path: String) = Bpe.persistedBpe(docs, "text", 30, path)
    val (m1, v1) = run(tmpPath("bpe_a"))
    val gotMerges = m1.orderBy(col("rank")).collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right")))
      .toList
    assert(gotMerges == refMerges,
      s"merge sequences differ at sf0.001:\n$gotMerges\n$refMerges")

    val gotCounts = Bpe.tokenCounts(docs, "doc_id", "text", v1)
      .collect().map(r =>
        r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens")).toMap
    val refCounts = texts.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty)
        .map(w => refVocab(w).length.toLong).sum
    }.toMap
    assert(gotCounts == refCounts, "token counts diverge from reference")

    // second independent build (fresh artifact dir) is bit-identical
    val (m2, _) = run(tmpPath("bpe_b"))
    assert(m2.orderBy(col("rank")).collect().toSeq ==
      m1.orderBy(col("rank")).collect().toSeq)
  }

  test("tokenCounts falls back to character segmentation for OOV words") {
    import spark.implicits._
    val trainDocs = Seq((0L, "aa aa bb")).toDF("doc_id", "text")
    val (_, vocab) = Bpe.train(trainDocs, "text", 4)
    val out = Bpe.tokenCounts(
      Seq((7L, "aa zzz")).toDF("doc_id", "text"), "doc_id", "text",
      vocab).collect().head
    // "aa" from vocab; "zzz" = 3 chars + </w> = 4
    val aaTokens = vocab.filter(col("word") === "aa")
      .collect().head.getAs[scala.collection.Seq[String]]("tokens").size
    assert(out.getAs[Long]("n_tokens") == aaTokens + 4L)
  }

  test("property: distributed trainer equals the reference on random " +
      "tie-heavy corpora") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    // a 4-letter alphabet and short words force pair-count TIES almost
    // every round — exactly where a wrong tie-break (or a
    // nondeterministic argmax) diverges from the reference
    val wordGen = Gen.chooseNum(1, 4)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d")))
      .map(_.mkString)
    val corpusGen = Gen.listOfN(12, wordGen).map(_.mkString(" "))
    val p = Prop.forAll(Gen.listOfN(3, corpusGen)) { texts =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val (merges, vocab) = Bpe.train(docs, "text", 6)
      val (refMerges, refVocab) = refTrain(refWordCounts(texts), 6)
      val gotVocab = vocab.collect().map(r =>
        r.getAs[String]("word") ->
          r.getAs[scala.collection.Seq[String]]("tokens").toList).toMap
      merges.map(m => (m._2, m._3)) == refMerges && gotVocab == refVocab
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), p)
    assert(res.passed, res.status.toString)
  }

  private def tmpPath(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile
      .getAbsolutePath + "/idx"
}
