package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/**
 * PCM audio kernels: decode, frame-energy shingling, SNR.
 *
 * The payload swap of the graft (BASELINE.json `input_hint`): the reference
 * decodes image bytes (faiss_clip_similarity.py:27-53) and extracts visual
 * features (improved_faiss_detector.py:181-257); here the `bytes` column is
 * `pcm_s16le` little-endian int16 audio, and the perceptual representation is
 * a sequence of quantized log-energy frame codes — the audio analog of aHash
 * / dHash (similarities/utils/imagehash.py:159-250): robust to additive
 * noise at the >= 30 dB SNR invariant floor, discriminative through the
 * clip's amplitude envelope.
 *
 * All functions are row-local and deterministic (pure functions of the
 * bytes), exposed as UDFs: a per-row projection needs no shuffle, and the
 * binary slicing has no built-in Catalyst equivalent (SURVEY.md §2.11).
 */
object AudioPcm {

  /** pcm_s16le bytes -> float samples in [-1, 1). */
  def decodeJvm(bytes: Array[Byte]): Array[Float] = {
    val n = bytes.length / 2
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      val lo = bytes(2 * i) & 0xff
      val hi = bytes(2 * i + 1).toInt // sign-extended
      out(i) = ((hi << 8) | lo).toShort / 32768.0f
      i += 1
    }
    out
  }

  /** float samples -> pcm_s16le bytes (synthesis / round-trip tests). */
  def encodeJvm(samples: Array[Float]): Array[Byte] = {
    val out = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val v = math.max(-32768, math.min(32767, math.round(samples(i) * 32768.0f)))
      out(2 * i) = (v & 0xff).toByte
      out(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Signal-to-noise ratio in dB of `got` vs reference `ref`. */
  def snrDb(ref: Array[Float], got: Array[Float]): Double = {
    require(ref.length == got.length, s"length mismatch ${ref.length} vs ${got.length}")
    var sig = 0.0; var err = 0.0
    var i = 0
    while (i < ref.length) {
      val d = got(i) - ref(i)
      sig += ref(i).toDouble * ref(i); err += d.toDouble * d
      i += 1
    }
    if (err == 0.0) Double.PositiveInfinity else 10.0 * math.log10(sig / err)
  }

  /** Per-frame RMS energies (frame/hop in samples). */
  def frameRms(samples: Array[Float], frame: Int, hop: Int): Array[Double] = {
    if (samples.length < frame) return Array.empty
    val nFrames = (samples.length - frame) / hop + 1
    val out = new Array[Double](nFrames)
    var f = 0
    while (f < nFrames) {
      var acc = 0.0
      var i = f * hop
      val end = i + frame
      while (i < end) { acc += samples(i).toDouble * samples(i); i += 1 }
      out(f) = math.sqrt(acc / frame)
      f += 1
    }
    out
  }

  /** Quantize energies to `levels` log-scale codes relative to the clip max.
    * `mult` sets bucket width: larger = more discriminative, smaller = more
    * robust to additive noise (a flip needs the value to cross a bucket
    * edge). */
  def energyCodes(rms: Array[Double], levels: Int, mult: Double): Array[Int] = {
    if (rms.isEmpty) return Array.empty
    val maxR = rms.max
    if (maxR <= 0) return rms.map(_ => 0)
    rms.map { r =>
      val rel = r / maxR
      if (rel <= 0) 0
      else math.max(0, math.min(levels - 1,
        (levels - 1 + math.floor(mult * (math.log(rel) / math.log(2.0)))).toInt))
    }
  }

  /**
   * Distinct shingle hashes over the energy-code sequence: each shingle is
   * `framesPerShingle` consecutive codes, rolled into a 64-bit mix.
   * Pure function of (bytes, sr); sr fixes the frame geometry in ms.
   */
  def shinglesJvm(bytes: Array[Byte], srHz: Int, frameMs: Int, hopMs: Int,
                  framesPerShingle: Int, levels: Int): Array[Long] = {
    val samples = decodeJvm(bytes)
    val frame = math.max(1, srHz * frameMs / 1000)
    val hop = math.max(1, srHz * hopMs / 1000)
    val rms = frameRms(samples, frame, hop)
    val out = new scala.collection.mutable.HashSet[Long]()
    // two quantization resolutions: a noise-flip in one stream's codes rarely
    // coincides with a flip in the other, so the union keeps pair Jaccard
    // high at 35 dB SNR while the positional mix keeps cross-clip collisions
    // negligible.
    var stream = 0
    Seq(2.5, 1.25).foreach { mult =>
      val codes = energyCodes(rms, levels, mult)
      if (codes.nonEmpty) {
        if (codes.length < framesPerShingle) out += mixCodes(codes, 0, codes.length, stream)
        else {
          var f = 0
          while (f + framesPerShingle <= codes.length) {
            out += mixCodes(codes, f, framesPerShingle, stream)
            f += 1
          }
        }
      }
      stream += 1
    }
    out.toArray.sorted
  }

  /** Positional shingle mix: near-dup audio (additive noise) is
    * sample-aligned, so seeding with the window index costs no recall and
    * makes cross-clip chance collisions ~impossible (two clips must agree on
    * position AND all codes). */
  private def mixCodes(codes: Array[Int], off: Int, len: Int, stream: Int): Long = {
    var h = 0x9e3779b97f4a7c15L ^ (off.toLong * 0xd6e8feb86659fd93L) ^
      (stream.toLong * 0xa0761d6478bd642fL)
    var i = 0
    while (i < len) {
      h ^= codes(off + i).toLong
      h *= 0xc2b2ae3d27d4eb4fL
      h ^= h >>> 29
      i += 1
    }
    h
  }

  /** Audio shingle hashes folded into [0, Hashing.P) for the MinHash stage. */
  def shingles31Jvm(bytes: Array[Byte], srHz: Int, frameMs: Int, hopMs: Int,
                    framesPerShingle: Int, levels: Int): Array[Long] =
    shinglesJvm(bytes, srHz, frameMs, hopMs, framesPerShingle, levels)
      .map(h => java.lang.Math.floorMod(h, Hashing.P)).distinct.sorted

  /** UDF: (bytes, sr_hz) -> array<long> shingle hashes in [0, P). */
  def audioShingles(spark: SparkSession, bytes: Column, srHz: Column,
                    frameMs: Int, hopMs: Int, framesPerShingle: Int,
                    levels: Int): Column = {
    val f = udf((b: Array[Byte], sr: Int) =>
      if (b == null || b.isEmpty) Array.empty[Long]
      else shingles31Jvm(b, sr, frameMs, hopMs, framesPerShingle, levels))
    f(bytes, srHz)
  }

  /** UDF: decoded sample count (cheap decode sanity projection). */
  def sampleCount(bytes: Column): Column = {
    val f = udf((b: Array[Byte]) => if (b == null) 0 else b.length / 2)
    f(bytes)
  }
}
