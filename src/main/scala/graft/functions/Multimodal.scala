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
 * frame-sampling here). Image decode is ALSO real for the two uncompressed
 * formats a pure JVM can parse without codec libraries — binary PPM (P6) and
 * 24-bit BI_RGB BMP — with nearest-neighbor resize and pixel-statistics
 * features (grid means + luminance histogram) computed from the decoded
 * pixels; undecodable bytes yield null (the error contract). Compressed
 * formats (JPEG/PNG/H.264) and learned feature extractors (reference P13,
 * improved_faiss_detector.py:97-179) remain out of scope in this container:
 * `decodeImageJvm` is the single entry point a production build extends with
 * real codecs.
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

  // ---------------- image (real PPM/BMP decode, real plumbing) ----------------

  /** Decoded raster: row-major top-down RGB triplets, `rgb.length == w*h*3`. */
  final case class DecodedImage(width: Int, height: Int, rgb: Array[Byte])

  /** Pure-JVM decode of binary PPM (P6, maxval <= 255) and uncompressed
    * 24-bit BI_RGB BMP (bottom-up or top-down) to a canonical top-down RGB
    * raster. Returns null for anything else — undecodable bytes are the
    * null-feature contract, not an exception. Deterministic; no codec libs. */
  def decodeImageJvm(bytes: Array[Byte]): DecodedImage = {
    if (bytes == null || bytes.length < 4) return null
    if (bytes(0) == 'P' && bytes(1) == '6') decodePpm(bytes)
    else if (bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
    else null
  }

  private def decodePpm(b: Array[Byte]): DecodedImage = {
    // header: "P6" <ws> width <ws> height <ws> maxval <single ws> raster;
    // '#' starts a comment running to end-of-line anywhere in the header
    var i = 2
    def isWs(c: Byte) = c == ' ' || c == '\t' || c == '\n' || c == '\r'
    def token(): Long = {
      while (i < b.length && (isWs(b(i)) || b(i) == '#')) {
        if (b(i) == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else i += 1
      }
      var v = -1L
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        v = math.max(0L, v) * 10 + (b(i) - '0'); i += 1
      }
      v
    }
    val w = token(); val h = token(); val maxv = token()
    if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 255) return null
    if (i >= b.length || !isWs(b(i))) return null
    i += 1 // exactly ONE whitespace byte separates header and raster
    val n = w * h * 3
    if (n > Int.MaxValue - 16 || b.length - i < n) return null
    DecodedImage(w.toInt, h.toInt,
      java.util.Arrays.copyOfRange(b, i, i + n.toInt))
  }

  private def decodeBmp(b: Array[Byte]): DecodedImage = {
    def i32(o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    def i16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    if (b.length < 54) return null
    val dataOff = i32(10)
    val w = i32(18)
    val hRaw = i32(22)
    val bpp = i16(28)
    val compression = i32(30)
    if (w <= 0 || hRaw == 0 || bpp != 24 || compression != 0) return null
    val h = math.abs(hRaw)
    val topDown = hRaw < 0
    val rowSize = ((w * 3 + 3) / 4) * 4 // rows padded to 4 bytes
    if (w.toLong * h * 3 > Int.MaxValue - 16) return null
    if (dataOff < 0 || dataOff.toLong + rowSize.toLong * h > b.length) return null
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = dataOff + (if (topDown) y else h - 1 - y) * rowSize
      var x = 0
      while (x < w) {
        val s = srcRow + x * 3 // stored BGR
        val d = (y * w + x) * 3
        rgb(d) = b(s + 2); rgb(d + 1) = b(s + 1); rgb(d + 2) = b(s)
        x += 1
      }
      y += 1
    }
    DecodedImage(w, h, rgb)
  }

  /** Binary-PPM (P6) encoder — fixture generation and sink-side round trips. */
  def encodePpmJvm(img: DecodedImage): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.rgb, 0, out, header.length, img.rgb.length)
    out
  }

  /** Nearest-neighbor resize (deterministic: source index = i*srcDim/dstDim). */
  def resizeImageJvm(img: DecodedImage, w: Int, h: Int): DecodedImage = {
    if (img == null || w <= 0 || h <= 0) return null
    if (w == img.width && h == img.height) return img
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val sy = (y.toLong * img.height / h).toInt
      var x = 0
      while (x < w) {
        val sx = (x.toLong * img.width / w).toInt
        val s = (sy * img.width + sx) * 3
        val d = (y * w + x) * 3
        out(d) = img.rgb(s); out(d + 1) = img.rgb(s + 1); out(d + 2) = img.rgb(s + 2)
        x += 1
      }
      y += 1
    }
    DecodedImage(w, h, out)
  }

  /** 64-dim pixel-statistics features from DECODED pixels (the traditional-
    * features analog, reference improved_faiss_detector.py:181-209's
    * color-stat slot): a 4x4 grid of per-cell mean R/G/B (48 dims, /255)
    * followed by a 16-bin luminance histogram (fractions). Null for
    * undecodable bytes — the error contract feature consumers rely on. */
  def imageFeaturesJvm(bytes: Array[Byte]): Array[Float] = {
    val img = decodeImageJvm(bytes)
    if (img == null) return null
    val out = new Array[Float](64)
    val g = 4
    val sums = new Array[Long](g * g * 3)
    val counts = new Array[Long](g * g)
    val hist = new Array[Long](16)
    var y = 0
    while (y < img.height) {
      val gy = math.min(g - 1, y * g / img.height)
      var x = 0
      while (x < img.width) {
        val gx = math.min(g - 1, x * g / img.width)
        val cell = gy * g + gx
        val s = (y * img.width + x) * 3
        val r = img.rgb(s) & 0xff; val gr = img.rgb(s + 1) & 0xff; val bl = img.rgb(s + 2) & 0xff
        sums(cell * 3) += r; sums(cell * 3 + 1) += gr; sums(cell * 3 + 2) += bl
        counts(cell) += 1
        hist(((299 * r + 587 * gr + 114 * bl) / 1000) * 16 / 256) += 1
        x += 1
      }
      y += 1
    }
    var c = 0
    while (c < g * g) {
      val n = math.max(1L, counts(c))
      out(c * 3) = (sums(c * 3).toDouble / n / 255.0).toFloat
      out(c * 3 + 1) = (sums(c * 3 + 1).toDouble / n / 255.0).toFloat
      out(c * 3 + 2) = (sums(c * 3 + 2).toDouble / n / 255.0).toFloat
      c += 1
    }
    val total = img.width.toLong * img.height
    var k = 0
    while (k < 16) { out(48 + k) = (hist(k).toDouble / total).toFloat; k += 1 }
    out
  }

  def imageFeatures(bytes: Column): Column = {
    val f = udf((b: Array[Byte]) => imageFeaturesJvm(b))
    f(bytes)
  }

  /** UDF: decode-resize-reencode an image column (PPM out) — the bounded
    * per-row transform slot video/image pipelines hang off `canonicalize`. */
  def resizeTo(bytes: Column, w: Int, h: Int): Column = {
    val f = udf((b: Array[Byte]) => {
      val img = decodeImageJvm(b)
      if (img == null) null else encodePpmJvm(resizeImageJvm(img, w, h))
    })
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
