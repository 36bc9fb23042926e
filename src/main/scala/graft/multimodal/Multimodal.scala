package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Multimodal columns for training-data pipelines: media payloads ride as
  * opaque `binary` columns with typed metadata alongside, and every
  * transform below is ordinary columnar dataflow — so partitioning,
  * predicate pushdown, and shuffle behavior are identical to any other
  * column at 100 TB (the payload bytes never become a special case).
  *
  * The actual codec step (JPEG/PNG/audio decode) is STUBBED: this
  * container ships no media libraries, so [[decodeStub]] derives a
  * deterministic fake feature vector from the payload bytes. The
  * Spark-side plumbing — schema, batch shape, partitioned layout,
  * downstream joins — is real and tested; swapping the stub for a real
  * decoder changes one expression, not the pipeline.
  */
object Multimodal {

  val MediaTypes: Seq[String] = Seq("image", "audio", "video")

  /** Synthesize a media table from the documents corpus: payload bytes are
    * the UTF-8 text (a deterministic stand-in for real media bytes), media
    * type round-robins by id, and metadata is a typed struct — the shape a
    * crawler's media sidecar table has.
    */
  def mediaFromDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(
        array(MediaTypes.map(lit): _*),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("payload"),
      struct(
        length(col("text").cast("binary")).cast(LongType).as("byte_len"),
        col("source").as("origin"),
        col("lang").as("lang_hint")).as("meta"))

  /** Payload size in bytes. */
  def payloadBytes(payload: Column): Column =
    length(payload).cast(LongType)

  /** `n` evenly-spaced fixed-width byte slices of the payload — the
    * binary-plumbing analog of video frame sampling. Pure map-side
    * `substring` on binary; no shuffle, no row explosion unless the caller
    * explodes.
    */
  def frameSample(payload: Column, n: Int, frameLen: Int): Column = {
    val total = length(payload)
    val stride = greatest(total.cast(LongType) / n, lit(1L)).cast("int")
    transform(sequence(lit(0), lit(n - 1)),
      i => substring(payload, i * stride + 1, lit(frameLen)))
  }

  /** STUB resize: byte-level downsample keeping every `factor`-th byte —
    * the binary-plumbing analog of image resizing (a real implementation
    * swaps in a codec's scaler; the schema/partitioning contract — binary
    * in, smaller binary out, map-side — is what downstream operators
    * depend on). Output length is ceil(len / factor). Single-pass
    * codegen'd kernel ([[graft.functions.BinaryStride]]); callers must
    * have run `GraftFunctions.register` on the session.
    */
  def resizeStub(payload: Column, factor: Int): Column =
    org.apache.spark.sql.functions.call_function("binary_stride",
      payload, lit(factor))

  /** STUB decoder: a deterministic `dims`-float fake feature vector from
    * payload byte slices (xxhash of each slice, scaled to [-1, 1]). A real
    * deployment replaces this one expression with a codec call; everything
    * downstream (ANN joins, dedup over features) is unchanged.
    */
  def decodeStub(payload: Column, dims: Int): Column =
    transform(frameSample(payload, dims, 16),
      sl => (pmod(xxhash64(sl), lit(2000001L)) - 1000000L)
        .cast("double") / 1000000.0)

  /** 64-bit content fingerprint of the payload (exact-dup detection over
    * media bytes without ever shuffling the bytes).
    */
  def payloadFingerprint(payload: Column): Column = xxhash64(payload)
}
