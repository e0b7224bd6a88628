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

  test("media plumbing end-to-end: canonicalize -> features column") {
    val clips = spark.createDataFrame((0L until 10L).map(i => ClipCorpus.genClip(cc, i)))
    val canon = Multimodal.canonicalize(clips, "clip_id", "bytes",
      "pcm_s16le", srCol = Some("sr_hz"), durCol = Some("dur_ms"))
    assert(canon.columns.toSeq == Seq("media_id", "bytes", "meta"))
    val feats = canon.select(col("media_id"),
      Multimodal.imageFeaturesStub(col("bytes")).as("f"))
      .collect().map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    assert(feats.values.forall(_.length == 64))
    // deterministic: same bytes -> same features on recompute
    val again = canon.select(col("media_id"),
      Multimodal.imageFeaturesStub(col("bytes")).as("f"))
      .collect().map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    assert(feats == again)
    // null contract: empty bytes -> null features
    val nullRow = Seq(("x", Array.empty[Byte])).toDF("media_id", "bytes")
      .select(Multimodal.imageFeaturesStub(col("bytes")).as("f")).head()
    assert(nullRow.isNullAt(0))
  }
}
