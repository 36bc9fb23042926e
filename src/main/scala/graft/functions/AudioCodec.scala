package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, IntegerType, LongType, StructField, StructType}

/** Real audio codec expressions over binary payload columns — the
  * audio sibling of [[ImageCodec]] (reference
  * `generate_sample_data.py` ships only tabular data; a training-data
  * lake carries media sidecars). WAV/PCM is pure-JDK
  * (`javax.sound.sampled`, java.desktop module — the same module
  * ImageIO lives in), so encode/decode here are REAL codec paths with
  * zero added dependencies; compressed audio (mp3/ogg) and video stay
  * behind the documented [[graft.multimodal.Multimodal.decodeStub]]
  * seam — this container ships no codec libraries for those.
  *
  * Both expressions are single-pass evals dispatched from generated
  * code (static `compute` calls, the [[BinaryStride]] shape), so they
  * sit inside WholeStageCodegen spans rather than breaking them. At
  * 100 TB the decode is embarrassingly parallel map-side work over an
  * ordinary binary column — no shuffle, no special-cased dataflow.
  */
object AudioCodec {

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "wav_encode",
      (es: Seq[Expression]) => WavEncode(es.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "wav_decode",
      (es: Seq[Expression]) => WavDecode(es.head), "scala_udf")
  }
}

/** Deterministic mono PCM16 WAV from a long seed: the sample count
  * derives from the seed ([[WavEncode.nSamplesOf]], 200–1000 samples
  * at 8 kHz) and the waveform is a seed-keyed sine tone
  * ([[WavEncode.freqOf]]/[[WavEncode.ampOf]], `StrictMath.sin` so the
  * bytes are bit-identical on any JVM) — a REAL, decodable RIFF/WAVE
  * byte stream standing in for crawled audio, reproducible across
  * runs and engines.
  */
case class WavEncode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "wav_encode"

  override def nullSafeEval(input: Any): Any =
    WavEncode.compute(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WavEncode.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): WavEncode = copy(child = newChild)
}

object WavEncode {

  val SampleRate = 8000

  def nSamplesOf(seed: Long): Int =
    200 + java.lang.Math.floorMod(seed, 801L).toInt

  /** Tone frequency in Hz, 100–999 — below Nyquist at 8 kHz. */
  def freqOf(seed: Long): Int =
    100 + java.lang.Math.floorMod(seed / 7L, 900L).toInt

  /** Peak amplitude in [0.10, 0.89] of full scale. */
  def ampOf(seed: Long): Double =
    0.1 + java.lang.Math.floorMod(seed / 3L, 80L) / 100.0

  /** Called from generated code; must stay public + static-shaped. */
  def compute(seed: Long): Array[Byte] = {
    val n = nSamplesOf(seed)
    val f = freqOf(seed)
    val a = ampOf(seed)
    val dataLen = n * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(SampleRate).putInt(SampleRate * 2)
      .putShort(2).putShort(16) // block align, bits/sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      val s = a * StrictMath.sin(
        2.0 * StrictMath.PI * f * i / SampleRate)
      out.putShort(StrictMath.round(s * 32767.0).toShort)
      i += 1
    }
    out.array()
  }
}

/** Decode an audio payload through the JDK's WAV parser to
  * `(sample_rate, n_samples, rms, peak)` — NULL when the bytes are not
  * parseable PCM audio (image/video rows of a mixed media table take
  * this branch), so mixed media tables decode in one pass without a
  * media-type dispatch. `rms` and `peak` are over samples normalized
  * to [-1, 1] — the canonical cheap loudness features.
  */
case class WavDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("rms", DoubleType, nullable = false),
    StructField("peak", DoubleType, nullable = false)))

  override def nullable: Boolean = true
  override def prettyName: String = "wav_decode"

  override def nullSafeEval(input: Any): Any =
    WavDecode.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    // nullSafeCodeGen (not defineCodeGen): unparseable bytes yield a
    // java null that must flip the null flag, not flow on as a value
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WavDecode.compute($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(
      newChild: Expression): WavDecode = copy(child = newChild)
}

object WavDecode {

  /** Called from generated code; must stay public + static-shaped.
    * Returns null for bytes the JDK audio parser rejects, or formats
    * other than 16-bit signed PCM (the only shape [[WavEncode]] — and
    * canonical WAV — produces).
    */
  def compute(bytes: Array[Byte])
      : org.apache.spark.sql.catalyst.InternalRow = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val in =
      try AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException |
            _: java.io.IOException => null
      }
    if (in == null) return null
    try {
      val fmt = in.getFormat
      if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
        fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) return null
      val data = in.readAllBytes()
      val n = data.length / 2
      if (n == 0) return null
      val buf = java.nio.ByteBuffer.wrap(data).order(
        if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
        else java.nio.ByteOrder.LITTLE_ENDIAN)
      var sumSq = 0.0
      var peak = 0.0
      var i = 0
      while (i < n) {
        val s = buf.getShort(i * 2) / 32768.0
        sumSq += s * s
        val a = StrictMath.abs(s)
        if (a > peak) peak = a
        i += 1
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](fmt.getSampleRate.toInt, n.toLong,
          StrictMath.sqrt(sumSq / n), peak))
    } finally in.close()
  }
}
