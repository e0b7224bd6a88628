package graft

import graft.functions.{AudioPcm, Multimodal}
import graft.sources.{ClipCorpus, CorpusConfig}
import org.apache.spark.sql.functions._

/** Multimodal binary plumbing: real audio resample/frame-sample kernels and
  * the stubbed image-decode contract (schema, nulls, determinism). */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  val cc = CorpusConfig(seed = 42L, n = 10L)

  test("linear resample preserves the waveform (SNR >= 25 dB vs direct synth)") {
    val p = ClipCorpus.headParams(42L, 0L, cc)
    require(p.srHz == 8000 || p.srHz == 16000)
    val src = AudioPcm.encodeJvm(ClipCorpus.synth(p))
    val target = if (p.srHz == 8000) 16000 else 8000
    val res = Multimodal.resampleJvm(src, p.srHz, target)
    // direct synthesis at the target rate = ground truth
    val truth = ClipCorpus.synth(p.copy(srHz = target))
    val got = AudioPcm.decodeJvm(res)
    val n = math.min(truth.length, got.length)
    val snr = AudioPcm.snrDb(truth.take(n), got.take(n))
    // downsampling a tone near Nyquist aliases; corpus tones stay below
    // sr/2 - 600 so 25 dB is achievable for linear interp
    assert(snr >= 25.0, s"resample SNR $snr dB")
    assert(math.abs(got.length - truth.length) <= 2)
  }

  test("identity resample is a no-op; frame sampling has bounded output") {
    val clip = ClipCorpus.genClip(cc, 1L)
    assert(Multimodal.resampleJvm(clip.bytes, clip.sr_hz, clip.sr_hz) eq clip.bytes)
    val frames = Multimodal.frameSampleJvm(clip.bytes, clip.sr_hz, 10, 4)
    val frameBytes = 2 * (clip.sr_hz * 10 / 1000)
    assert(frames.nonEmpty)
    assert(frames.forall(_.length == frameBytes))
    val total = clip.bytes.length / frameBytes
    assert(frames.length == (total + 3) / 4)
  }

  // ---- planted image fixtures: a deterministic 4x2 RGB raster ----
  // top-down rows: (r,g,b) = (10,20,30) (40,50,60) (70,80,90) (100,110,120)
  //                (130,140,150) (160,170,180) (190,200,210) (220,230,240)
  private def fixtureRgb: Array[Byte] =
    (0 until 24).map(i => ((i + 1) * 10).toByte).toArray
  private def fixtureImg = Multimodal.DecodedImage(4, 2, fixtureRgb)

  /** Hand-built 24-bit BI_RGB BMP of the fixture (bottom-up rows, BGR, rows
    * padded to 4 bytes) — byte-for-byte what a real writer would emit. */
  private def fixtureBmp(topDown: Boolean): Array[Byte] = {
    val w = 4; val h = 2; val rowSize = ((w * 3 + 3) / 4) * 4 // = 12
    val out = new java.io.ByteArrayOutputStream()
    def i32(v: Int): Unit = { out.write(v); out.write(v >> 8); out.write(v >> 16); out.write(v >> 24) }
    def i16(v: Int): Unit = { out.write(v); out.write(v >> 8) }
    out.write('B'); out.write('M')
    i32(54 + rowSize * h); i32(0); i32(54) // size, reserved, data offset
    i32(40); i32(w); i32(if (topDown) -h else h) // DIB header
    i16(1); i16(24); i32(0); i32(rowSize * h); i32(2835); i32(2835); i32(0); i32(0)
    val rows = if (topDown) 0 until h else (h - 1) to 0 by -1
    rows.foreach { y =>
      (0 until w).foreach { x =>
        val s = (y * w + x) * 3
        out.write(fixtureRgb(s + 2)); out.write(fixtureRgb(s + 1)); out.write(fixtureRgb(s))
      }
      (w * 3 until rowSize).foreach(_ => out.write(0))
    }
    out.toByteArray
  }

  test("PPM and BMP fixtures decode bit-exactly to the planted raster") {
    // PPM with a header comment — the format corner a lax parser misses
    val ppm = ("P6\n# fixture\n4 2\n255\n").getBytes("US-ASCII") ++ fixtureRgb
    val dp = Multimodal.decodeImageJvm(ppm)
    assert(dp != null && dp.width == 4 && dp.height == 2)
    assert(dp.rgb.toSeq == fixtureRgb.toSeq)
    // encoder round-trip is byte-exact
    val rt = Multimodal.decodeImageJvm(Multimodal.encodePpmJvm(fixtureImg))
    assert(rt.rgb.toSeq == fixtureRgb.toSeq)
    // BMP bottom-up AND top-down both land on the canonical top-down raster
    val db = Multimodal.decodeImageJvm(fixtureBmp(topDown = false))
    assert(db != null && db.width == 4 && db.height == 2)
    assert(db.rgb.toSeq == fixtureRgb.toSeq)
    val dt = Multimodal.decodeImageJvm(fixtureBmp(topDown = true))
    assert(dt.rgb.toSeq == fixtureRgb.toSeq)
    // undecodable: truncated raster, wrong magic, compressed-BMP flag
    assert(Multimodal.decodeImageJvm(ppm.dropRight(1)) == null)
    assert(Multimodal.decodeImageJvm("JFIF....".getBytes) == null)
    val rle = fixtureBmp(topDown = false); rle(30) = 1 // BI_RLE8
    assert(Multimodal.decodeImageJvm(rle) == null)
  }

  test("nearest-neighbor resize picks exact source pixels") {
    val up = Multimodal.resizeImageJvm(fixtureImg, 8, 2)
    assert(up.width == 8 && up.height == 2)
    // x' = x*4/8 -> each source pixel doubled horizontally
    val expect = (0 until 2).flatMap(y => (0 until 8).flatMap { x =>
      val s = (y * 4 + x / 2) * 3; fixtureRgb.slice(s, s + 3)
    })
    assert(up.rgb.toSeq == expect)
    // identity resize returns the same instance (no copy)
    val one = fixtureImg
    assert(Multimodal.resizeImageJvm(one, 4, 2) eq one)
  }

  test("media plumbing end-to-end: canonicalize -> real pixel features") {
    // ten deterministic PPM images (distinct constant-ish rasters)
    val imgs = (0 until 10).map { i =>
      val rgb = Array.tabulate(6 * 4 * 3)(k => ((i * 37 + k * 11) % 256).toByte)
      (s"img_$i", Multimodal.encodePpmJvm(Multimodal.DecodedImage(6, 4, rgb)))
    }
    val media = imgs.toDF("media_id", "bytes")
    val canon = Multimodal.canonicalize(media, "media_id", "bytes", "ppm")
    assert(canon.columns.toSeq == Seq("media_id", "bytes", "meta"))
    val feats = canon.select(col("media_id"),
      Multimodal.imageFeatures(col("bytes")).as("f"))
      .collect().map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    assert(feats.values.forall(_.length == 64))
    // histogram bins are fractions summing to ~1; grid means are in [0,1]
    feats.values.foreach { f =>
      assert(f.take(48).forall(v => v >= 0f && v <= 1f))
      assert(math.abs(f.drop(48).map(_.toDouble).sum - 1.0) < 1e-6)
    }
    // deterministic: same bytes -> same features on recompute
    val again = canon.select(col("media_id"),
      Multimodal.imageFeatures(col("bytes")).as("f"))
      .collect().map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    assert(feats == again)
    // null contract: empty AND undecodable (raw PCM) bytes -> null features
    val clip = ClipCorpus.genClip(cc, 1L)
    val nulls = Seq(("x", Array.empty[Byte]), ("y", clip.bytes))
      .toDF("media_id", "bytes")
      .select(Multimodal.imageFeatures(col("bytes")).as("f")).collect()
    assert(nulls.forall(_.isNullAt(0)))
    // resize-in-pipeline: every row decodes after resizeTo
    val resized = media.select(
      Multimodal.resizeTo(col("bytes"), 3, 2).as("bytes"))
      .select(Multimodal.imageFeatures(col("bytes")).as("f")).collect()
    assert(resized.forall(r => !r.isNullAt(0) && r.getSeq[Float](0).length == 64))
  }
}
