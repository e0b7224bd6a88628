package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal binary-column plumbing: media travel as opaque `binary` columns
 * with typed metadata (the pattern the reference applies to images —
 * path/URL/ndarray/base64 all normalized to one decode entry point,
 * faiss_clip_similarity.py:27-53, utils/image_util.py:23-107).
 *
 * Audio ops are REAL (pcm_s16le decode lives in AudioPcm; resample and
 * frame-sampling here). Image/video decode is a clearly-marked DETERMINISTIC
 * STUB — this container ships no codec libraries — so the Spark-side
 * contract (schema, UDF signatures, per-row batch shape, null/error
 * handling) is real and tested while the codec call is the single function a
 * production build swaps out.
 */
object Multimodal {

  /** Typed metadata carried next to every media binary column. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),       // "pcm_s16le" | "jpeg" | "h264" | ...
    StructField("sample_rate_hz", IntegerType), // audio
    StructField("width", IntegerType),       // image/video
    StructField("height", IntegerType),
    StructField("duration_ms", IntegerType)))

  // ---------------- audio (real) ----------------

  /** Linear-interpolation resample of pcm_s16le bytes. */
  def resampleJvm(bytes: Array[Byte], srFrom: Int, srTo: Int): Array[Byte] = {
    if (bytes == null || srFrom <= 0 || srTo <= 0) return Array.empty
    if (srFrom == srTo) return bytes
    val in = AudioPcm.decodeJvm(bytes)
    if (in.length < 2) return bytes
    val nOut = math.max(1, (in.length.toLong * srTo / srFrom).toInt)
    val out = new Array[Float](nOut)
    var i = 0
    while (i < nOut) {
      val pos = i.toDouble * srFrom / srTo
      val i0 = math.min(in.length - 1, pos.toInt)
      val i1 = math.min(in.length - 1, i0 + 1)
      val frac = (pos - i0).toFloat
      out(i) = in(i0) * (1 - frac) + in(i1) * frac
      i += 1
    }
    AudioPcm.encodeJvm(out)
  }

  /** UDF: resample a pcm_s16le column to a fixed target rate. */
  def resampleTo(bytes: Column, srHz: Column, targetHz: Int): Column = {
    val f = udf((b: Array[Byte], sr: Int) => resampleJvm(b, sr, targetHz))
    f(bytes, srHz)
  }

  /** Every k-th frame of `frameMs` as raw pcm byte slices — the audio analog
    * of video frame sampling (bounded per-row output for feature UDFs). */
  def frameSampleJvm(bytes: Array[Byte], srHz: Int, frameMs: Int, everyK: Int): Array[Array[Byte]] = {
    if (bytes == null || srHz <= 0) return Array.empty
    val frameBytes = math.max(2, 2 * (srHz * frameMs / 1000))
    val nFrames = bytes.length / frameBytes
    (0 until nFrames by math.max(1, everyK)).map { f =>
      java.util.Arrays.copyOfRange(bytes, f * frameBytes, (f + 1) * frameBytes)
    }.toArray
  }

  def frameSample(bytes: Column, srHz: Column, frameMs: Int, everyK: Int): Column = {
    val f = udf((b: Array[Byte], sr: Int) => frameSampleJvm(b, sr, frameMs, everyK))
    f(bytes, srHz)
  }

  // ---------------- image/video (STUBBED decode, real plumbing) ----------------

  /**
   * STUB — deterministic fake image decode. A production build replaces the
   * body with a real codec call (e.g. TwelveMonkeys/javacv); everything
   * around it — signature bytes->float[] features, null on undecodable,
   * fixed output dimensionality — is the real contract.
   * The fake: 64 "pixel statistics" derived from a seeded hash of the bytes,
   * stable across partitionings (usable as a feature column in tests).
   */
  def imageFeaturesStubJvm(bytes: Array[Byte]): Array[Float] = {
    if (bytes == null || bytes.isEmpty) return null
    val out = new Array[Float](64)
    var h = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < bytes.length) { h ^= bytes(i); h *= 0x100000001b3L; i += 1 }
    i = 0
    while (i < 64) {
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 29
      out(i) = ((h >>> 11).toDouble * 1.1102230246251565e-16).toFloat
      i += 1
    }
    out
  }

  def imageFeaturesStub(bytes: Column): Column = {
    val f = udf((b: Array[Byte]) => imageFeaturesStubJvm(b))
    f(bytes)
  }

  /** Normalize any media table to the canonical (id, bytes, meta) shape —
    * the single entry point every feature extractor reads from. */
  def canonicalize(df: DataFrame, idCol: String, bytesCol: String,
                   format: String, srCol: Option[String] = None,
                   durCol: Option[String] = None): DataFrame = {
    val meta = struct(
      lit(format).as("format"),
      srCol.map(col).getOrElse(lit(null).cast("int")).as("sample_rate_hz"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height"),
      durCol.map(col).getOrElse(lit(null).cast("int")).as("duration_ms"))
    df.select(col(idCol).as("media_id"), col(bytesCol).as("bytes"), meta.as("meta"))
  }
}
