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

  test("media table schema: binary payload + typed metadata struct; " +
    "image rows carry a REAL PNG byte stream") {
    val m = M.mediaFromDocs(docs())
    assert(m.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val meta = m.schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq == Seq("byte_len", "origin", "lang_hint"))
    // doc 0 is image-typed: its payload decodes as a genuine PNG via
    // the plain JDK reader, at the seed-derived dimensions
    val img = m.filter(col("media_id") === 0).collect().head
    assert(img.getAs[String]("media_type") == "image")
    val decoded = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(img.getAs[Array[Byte]]("payload")))
    assert(decoded != null, "image payload must be a decodable PNG")
    assert(decoded.getWidth == graft.functions.PngEncode.widthOf(0L))
    assert(decoded.getHeight == graft.functions.PngEncode.heightOf(0L))
    // doc 1 is audio-typed: payload stays the UTF-8 text stand-in
    val au = m.filter(col("media_id") === 1).collect().head
    assert(au.getAs[String]("media_type") == "audio")
    assert(new String(au.getAs[Array[Byte]]("payload"), "UTF-8")
      .startsWith("a much longer document"))
  }

  test("payload byte length matches source text for non-image rows " +
    "(ASCII corpus); meta records the SOURCE length for all rows") {
    val rows = M.mediaFromDocs(docs())
      .select(col("media_id"), col("media_type"),
        M.payloadBytes(col("payload")).as("n"), col("meta.byte_len"))
      .collect()
    rows.filter(_.getString(1) != "image")
      .foreach(r => assert(r.getLong(2) == r.getLong(3)))
    // image rows: meta is the source text length, payload is the PNG
    rows.filter(_.getString(1) == "image")
      .foreach(r => assert(r.getLong(3) > 0))
  }

  test("png_encode / image_decode round-trip: dimensions follow the " +
    "seed formula, luma is a valid pixel mean, undecodable bytes " +
    "decode NULL") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val seeds = (0L until 40L).toDF("seed")
    val rt = seeds.select(col("seed"),
        M.decodeImage(graft.functions.GraftFunctions
          .pngEncode(col("seed"))).as("img"))
      .select(col("seed"), col("img.width"), col("img.height"),
        col("img.mean_luma"))
      .collect()
    assert(rt.length == 40)
    rt.foreach { r =>
      val s = r.getLong(0)
      assert(r.getInt(1) == graft.functions.PngEncode.widthOf(s),
        s"width mismatch at seed $s")
      assert(r.getInt(2) == graft.functions.PngEncode.heightOf(s),
        s"height mismatch at seed $s")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 255.0)
    }
    // text bytes are not an image: NULL, not an error
    val nul = Seq("just text").toDF("t")
      .select(M.decodeImage($"t".cast("binary")).as("img"))
      .collect().head
    assert(nul.isNullAt(0))
  }

  test("q_media_decode: image rows decode to their true dimensions, " +
    "non-image rows carry the stub feature with NULL image fields") {
    val rows = SparkEntry.queries("q_media_decode")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      if (r.getAs[String]("media_type") == "image") {
        assert(r.getAs[Int]("width") ==
          graft.functions.PngEncode.widthOf(id))
        assert(r.getAs[Int]("height") ==
          graft.functions.PngEncode.heightOf(id))
      } else {
        assert(r.isNullAt(r.fieldIndex("width")))
        assert(!r.isNullAt(r.fieldIndex("feat0")))
      }
    }
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
