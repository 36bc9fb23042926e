package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Column-level entry points for graft's custom Catalyst expressions, plus
  * session registration so they are callable from SQL text. Resolution goes
  * through the session function registry (`call_function`), so
  * [[register]] must have run on the session first. Sessions built with
  * `graft.governance.GraftExtensions` get this automatically (the
  * extension registers on analyzer construction); for any other session,
  * call [[register]] once up front — otherwise every helper here fails at
  * analysis time with UNRESOLVED_ROUTINE naming the missing function.
  * Query builders in `graft.queries` / `graft.dedup` also register
  * defensively for extension-less sessions.
  */
object GraftFunctions {

  /** 64-bit SimHash of a token array (see [[SimHash]]). */
  def simhash64(tokens: Column): Column = call_function("simhash64", tokens)

  /** k-value MinHash signature of a token array (see [[MinHashSig]]). */
  def minhash32(tokens: Column, shingleSize: Int, k: Int): Column =
    call_function("minhash32", tokens,
      org.apache.spark.sql.functions.lit(shingleSize),
      org.apache.spark.sql.functions.lit(k))

  /** Fused quantized cosine of two float vectors (see [[CosineQuant]]). */
  def cosineQuant(a: Column, b: Column): Column =
    call_function("cosine_quant", a, b)

  /** Hyperplane LSH bucket of a float vector (see [[HyperplaneBucket]]). */
  def hplaneBucket(v: Column, bits: Int, dims: Int): Column =
    call_function("hplane_bucket", v,
      org.apache.spark.sql.functions.lit(bits),
      org.apache.spark.sql.functions.lit(dims))

  /** Word n-gram shingles of a token array (see [[Shingles]]). */
  def shingles(tokens: Column, n: Int): Column =
    call_function("shingles", tokens,
      org.apache.spark.sql.functions.lit(n))

  /** Deterministic tiny PNG from a long seed (see [[PngEncode]]). */
  def pngEncode(seed: Column): Column = call_function("png_encode", seed)

  /** `(width, height, mean_luma)` of an image payload, NULL when the
    * bytes are not a decodable image (see [[ImageDecode]]).
    */
  def imageDecode(payload: Column): Column =
    call_function("image_decode", payload)

  /** Deterministic mono PCM16 WAV from a long seed (see [[WavEncode]]). */
  def wavEncode(seed: Column): Column = call_function("wav_encode", seed)

  /** `(sample_rate, n_samples, rms, peak)` of an audio payload, NULL
    * when the bytes are not parseable PCM audio (see [[WavDecode]]).
    */
  def wavDecode(payload: Column): Column =
    call_function("wav_decode", payload)

  /** Deterministic MJPEG-in-AVI clip from a long seed (see
    * [[AviEncode]]).
    */
  def aviEncode(seed: Column): Column = call_function("avi_encode", seed)

  /** `(n_frames, width, height, mean_luma)` of a video payload, NULL
    * when the bytes are not an AVI of decodable frames (see
    * [[AviDecode]]).
    */
  def aviDecode(payload: Column): Column =
    call_function("avi_decode", payload)

  /** 64-bit perceptual difference hash of an image payload, NULL when
    * the bytes are not a decodable image (see [[DHash64]]).
    */
  def dhash64(payload: Column): Column = call_function("dhash64", payload)

  /** Deterministic 3-pixel low-bit perturbation of an image payload,
    * re-encoded as PNG (see [[PngPerturb]]).
    */
  def pngPerturb(payload: Column, seed: Column): Column =
    call_function("png_perturb", payload, seed)

  /** 64-bit perceptual audio fingerprint of a WAV payload, NULL when
    * the bytes are not parseable PCM audio (see [[AudioFp64]]).
    */
  def audioFp64(payload: Column): Column =
    call_function("audio_fp64", payload)

  /** Deterministic 3-sample low-bit perturbation of a WAV payload
    * (see [[WavPerturb]]).
    */
  def wavPerturb(payload: Column, seed: Column): Column =
    call_function("wav_perturb", payload, seed)

  /** Canonical NFC composition of a string (see [[NfcNormalize]]). */
  def nfcNormalize(text: Column): Column =
    call_function("nfc_normalize", text)

  /** Combining-mark removal — "Café" → "Cafe" (see [[StripAccents]]). */
  def stripAccents(text: Column): Column =
    call_function("strip_accents", text)

  /** Register all graft SQL functions on a session (idempotent). */
  def register(spark: SparkSession): Unit = {
    SimHash.register(spark)
    MinHashSig.register(spark)
    VectorExprs.register(spark)
    BinaryStride.register(spark)
    Shingles.register(spark)
    ImageCodec.register(spark)
    AudioCodec.register(spark)
    VideoCodec.register(spark)
    PerceptualHash.register(spark)
    UnicodeNorm.register(spark)
  }
}
