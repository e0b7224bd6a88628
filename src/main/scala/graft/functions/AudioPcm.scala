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

  /** Per-frame zero-crossing counts (frame/hop in samples) — a cheap spectral
    * fingerprint: a sine at f Hz crosses zero ~2f·frame/sr times per frame,
    * so the count separates clips by dominant frequency content where the
    * energy envelope alone cannot (noise-robust: a 35 dB SNR perturbation
    * moves crossings only near zero-amplitude samples). */
  def frameZcr(samples: Array[Float], frame: Int, hop: Int): Array[Int] = {
    if (samples.length < frame) return Array.empty
    val nFrames = (samples.length - frame) / hop + 1
    val out = new Array[Int](nFrames)
    var f = 0
    while (f < nFrames) {
      var c = 0
      var i = f * hop + 1
      val end = f * hop + frame
      while (i < end) {
        if ((samples(i) >= 0) != (samples(i - 1) >= 0)) c += 1
        i += 1
      }
      out(f) = c
      f += 1
    }
    out
  }

  /** Quantize zero-crossing counts on a log scale: code = floor(mult *
    * log2(1 + count) + offset). See shinglesJvm for the offset scheme. */
  def zcrCodes(zcr: Array[Int], mult: Double, offset: Double): Array[Int] =
    zcr.map(c => math.floor(mult * (math.log(1.0 + c) / math.log(2.0)) + offset).toInt)

  /** Quantize energies to `levels` log-scale codes relative to the clip max.
    * `mult` sets bucket width: larger = more discriminative, smaller = more
    * robust to additive noise (a flip needs the value to cross a bucket
    * edge). */
  def energyCodes(rms: Array[Double], levels: Int, mult: Double,
                  offset: Double = 0.0): Array[Int] = {
    if (rms.isEmpty) return Array.empty
    val maxR = rms.max
    if (maxR <= 0) return rms.map(_ => 0)
    rms.map { r =>
      val rel = r / maxR
      if (rel <= 0) 0
      else math.max(0, math.min(levels - 1,
        (levels - 1 + math.floor(mult * (math.log(rel) / math.log(2.0)) + offset)).toInt))
    }
  }

  /** One pass over the int16 PCM computing BOTH per-frame RMS (int16-domain:
    * exactly 32768x the float-domain RMS — power-of-two scaling commutes
    * with every rounding step, and energyCodes normalizes by the clip max,
    * so the codes are BIT-IDENTICAL to the decode-then-frame path) and
    * zero-crossing counts (sign is scale-invariant), reading samples
    * straight from the little-endian bytes. No decoded float array is
    * materialized (4 bytes/sample of allocation+write on the signature
    * stage's hottest kernel) and the sample scan runs once, not twice —
    * the signature stage is DRAM-bound at high parallelism, so cut bytes
    * moved, not just instructions. */
  def frameRmsZcrFromPcm(bytes: Array[Byte], frame: Int,
                         hop: Int): (Array[Double], Array[Int]) = {
    val n = bytes.length / 2
    if (n < frame) return (Array.empty, Array.empty)
    val nFrames = (n - frame) / hop + 1
    val rms = new Array[Double](nFrames)
    val zcr = new Array[Int](nFrames)
    var f = 0
    while (f < nFrames) {
      val start = f * hop
      var i = start
      val end = start + frame
      var prev = (((bytes(2 * i + 1).toInt) << 8) | (bytes(2 * i) & 0xff)).toShort.toInt
      var acc = prev.toDouble * prev
      var c = 0
      i += 1
      while (i < end) {
        val v = (((bytes(2 * i + 1).toInt) << 8) | (bytes(2 * i) & 0xff)).toShort.toInt
        acc += v.toDouble * v
        if ((v >= 0) != (prev >= 0)) c += 1
        prev = v
        i += 1
      }
      rms(f) = math.sqrt(acc / frame)
      zcr(f) = c
      f += 1
    }
    (rms, zcr)
  }

  /**
   * Distinct shingle hashes over the energy-code sequence: each shingle is
   * `framesPerShingle` consecutive codes, rolled into a 64-bit mix.
   * Pure function of (bytes, sr); sr fixes the frame geometry in ms.
   */
  def shinglesJvm(bytes: Array[Byte], srHz: Int, frameMs: Int, hopMs: Int,
                  framesPerShingle: Int, levels: Int): Array[Long] = {
    val frame = math.max(1, srHz * frameMs / 1000)
    val hop = math.max(1, srHz * hopMs / 1000)
    val (rms, zcr) = frameRmsZcrFromPcm(bytes, frame, hop)
    // primitive array + sort-dedup, NOT a HashSet[Long]: boxing every hash
    // across 32 executor threads makes the signature stage GC-bound.
    val nWin = math.max(1, rms.length - framesPerShingle + 1)
    val buf = new Array[Long](4 * nWin)
    var nOut = 0
    // Four quantization streams with INTERLEAVED fractional offsets (0, 1/4,
    // 1/2, 3/4) at a shared multiplier. A noise-induced drift in a clip-level
    // statistic (max energy, steady-tone ZCR) shifts ALL frames of a stream
    // by the same small amount, which can flip every code in that stream at
    // once — but interleaved offsets mean a small drift crosses at most ONE
    // stream's bucket boundary, so >= 3 of 4 streams always survive intact:
    // worst-case true-pair Jaccard floor is 3/5, typical ~1 — sized so the
    // r=3 LSH bands collide with prob >= 0.9999 at the floor. Each frame
    // code combines the energy envelope with a zero-crossing (spectral) code
    // so clips with similar envelopes but different frequency content do not
    // collide; the positional mix keeps chance collisions negligible.
    val EMult = 2.5
    val ZMult = 2.0
    var stream = 0
    Seq(0.0, 0.25, 0.5, 0.75).foreach { off =>
      val ec = energyCodes(rms, levels, EMult, off)
      val zc = zcrCodes(zcr, ZMult, off)
      val codes = Array.tabulate(ec.length)(f => ec(f) * 256 + zc(f))
      if (codes.nonEmpty) {
        if (codes.length < framesPerShingle) { buf(nOut) = mixCodes(codes, 0, codes.length, stream); nOut += 1 }
        else {
          var f = 0
          while (f + framesPerShingle <= codes.length) {
            buf(nOut) = mixCodes(codes, f, framesPerShingle, stream); nOut += 1
            f += 1
          }
        }
      }
      stream += 1
    }
    sortedDistinct(buf, nOut)
  }

  /** Sort + in-place dedup of buf[0, n) — allocation-light distinct. */
  def sortedDistinct(buf: Array[Long], n: Int): Array[Long] = {
    if (n == 0) return Array.empty
    java.util.Arrays.sort(buf, 0, n)
    var w = 1
    var i = 1
    while (i < n) {
      if (buf(i) != buf(w - 1)) { buf(w) = buf(i); w += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(buf, w)
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
                    framesPerShingle: Int, levels: Int): Array[Long] = {
    val hs = shinglesJvm(bytes, srHz, frameMs, hopMs, framesPerShingle, levels)
    var i = 0
    while (i < hs.length) { hs(i) = java.lang.Math.floorMod(hs(i), Hashing.P); i += 1 }
    sortedDistinct(hs, hs.length)
  }

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
