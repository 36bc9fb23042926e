package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.multimodal.{Multimodal => M}

class MultimodalSpec extends AnyFunSuite with SparkTestBase {

  private def docs() = {
    import spark.implicits._
    Seq(
      (0L, "hello world of binary payloads", "en", "web"),
      (1L, "a much longer document body that stands in for media bytes " +
        "with enough length to sample several frames from", "en", "web"),
      (2L, "short", "de", "book")
    ).toDF("doc_id", "text", "lang", "source")
  }

  test("media table schema: binary payload + typed metadata struct") {
    val m = M.mediaFromDocs(docs())
    assert(m.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val meta = m.schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq == Seq("byte_len", "origin", "lang_hint"))
    val row = m.filter(col("media_id") === 0).collect().head
    assert(row.getAs[String]("media_type") == "image")
    assert(new String(row.getAs[Array[Byte]]("payload"), "UTF-8") ==
      "hello world of binary payloads")
  }

  test("payload byte length matches source text (ASCII corpus)") {
    val rows = M.mediaFromDocs(docs())
      .select(col("media_id"), M.payloadBytes(col("payload")).as("n"),
        col("meta.byte_len"))
      .collect()
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2)))
  }

  test("frameSample yields n fixed-width slices from the payload") {
    val frames = M.mediaFromDocs(docs())
      .filter(col("media_id") === 1)
      .select(M.frameSample(col("payload"), 4, 8).as("f"))
      .collect().head.getSeq[Array[Byte]](0)
    assert(frames.length == 4)
    assert(frames.forall(_.length == 8))
    // first frame is the payload prefix
    assert(new String(frames.head, "UTF-8") == "a much l")
  }

  test("decodeStub: fixed dims, deterministic, bounded to [-1, 1]") {
    val feats = M.mediaFromDocs(docs())
      .select(col("media_id"), M.decodeStub(col("payload"), 8).as("f"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(feats.values.forall(_.length == 8))
    assert(feats.values.flatten.forall(v => v >= -1.0 && v <= 1.0))
    // deterministic across evaluations
    val again = M.mediaFromDocs(docs())
      .select(col("media_id"), M.decodeStub(col("payload"), 8).as("f"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(feats == again)
  }

  test("resizeStub downsamples payload bytes by the factor") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val out = Seq("abcdefghij").toDF("text")
      .select(M.resizeStub($"text".cast("binary"), 3).as("r"),
        M.resizeStub($"text".cast("binary"), 1).as("same"))
      .collect().head
    assert(new String(out.getAs[Array[Byte]]("r"), "UTF-8") == "adgj")
    assert(new String(out.getAs[Array[Byte]]("same"), "UTF-8") ==
      "abcdefghij")
  }

  test("payload fingerprint detects identical bytes") {
    import spark.implicits._
    val two = Seq((0L, "same bytes"), (1L, "same bytes"),
      (2L, "other bytes")).toDF("doc_id", "text")
      .select($"doc_id", M.payloadFingerprint($"text".cast("binary"))
        .as("fp")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two(0L) == two(1L))
    assert(two(0L) != two(2L))
  }
}
