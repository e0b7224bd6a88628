package graft.sources

import graft.functions.AudioPcm
import org.apache.spark.sql.{Dataset, SparkSession}

/** The input row shape pinned by BASELINE.json `input_hint`. */
final case class Clip(
    clip_id: String,
    bytes: Array[Byte],
    sr_hz: Int,
    dur_ms: Int,
    codec: String,
    transcript: String)

/** Golden sidecar: planted cluster membership (FIXTURES.md §2). */
final case class GoldenLabel(clip_id: String, cluster_id: Long, kind: String)

final case class CorpusConfig(
    seed: Long = 42L,
    n: Long = 10000L,
    durMinMs: Int = 200,
    durMaxMs: Int = 1000,
    tokensMin: Int = 20,
    tokensMax: Int = 80)

/**
 * Deterministic synthetic corpus of audio clip + transcript pairs with
 * planted duplicate clusters — the fixture style of the reference
 * (examples/data/image8-like-image1.png etc., filename-encoded clusters;
 * tests/test_imagesim.py:18-31).
 *
 * Row i is a pure function of (seed, i): generation is reproducible on any
 * partitioning, and a row's CLEAN signal can be regenerated independently for
 * the decoded-PCM SNR invariant (>= 30 dB, BASELINE.json `input_hint`).
 *
 * Planted structure (blocks of 10 rows):
 *  - with prob ~0.5 a block carries a cluster of 2-4 members; every 197th
 *    block is a heavy 10-member cluster (LSH hot-band skew exercise);
 *  - member kinds cycle exact / near_audio / near_text / containment:
 *      exact       — byte-identical audio + transcript        (hash path)
 *      near_audio  — +noise at SNR 35 dB, ~50% transcript subs (audio LSH)
 *      near_text   — fresh audio, <=10% transcript subs        (text LSH)
 *      containment — fresh audio, 100-char verbatim head substring embedded
 *                    in unrelated text (suffix/containment pass; mirrors the
 *                    reference's SequenceMatcher >70-char rule,
 *                    literal_similarity.py:1023,1039-1045)
 *  - every 37th distractor shares a fixed ~55-char boilerplate prefix
 *    (< 70 chars: hot shingles without being a true containment dup).
 */
object ClipCorpus {
  val BlockSize = 10
  val HeavyEvery = 197
  val Boilerplate = "standard intro notice recorded line quality monitor ok" // 55 chars

  // ---- seeded PRNG (SplitMix64): spec-stable across JVMs ----
  final class Rng(seed: Long) {
    private var s = seed
    def nextLong(): Long = {
      s += 0x9e3779b97f4a7c15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
    def nextInt(n: Int): Int = java.lang.Math.floorMod(nextLong(), n.toLong).toInt
    def nextGaussian(): Double = {
      val u1 = math.max(nextDouble(), 1e-12); val u2 = nextDouble()
      math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
    }
  }
  private def mix(parts: Long*): Long = {
    var h = 0x2545f4914f6cdd1dL
    parts.foreach { p => h ^= p; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33 }
    h
  }

  // ---- vocabulary: 2000 deterministic pseudo-words ----
  private val Syllables = Array("ka", "to", "mi", "ra", "su", "ne", "lo", "va",
    "shi", "dem", "pol", "gar", "nu", "ze", "bri", "tak", "mon", "fel", "qua", "dor")
  val VocabSize = 2000
  val vocab: Array[String] = Array.tabulate(VocabSize) { w =>
    val r = new Rng(mix(991L, w.toLong))
    val ns = 2 + r.nextInt(3)
    (0 until ns).map(_ => Syllables(r.nextInt(Syllables.length))).mkString
  }

  // ---- per-block head parameters ----
  final case class HeadParams(srHz: Int, durMs: Int, segAmps: Array[Double],
                              tones: Array[(Double, Double)], transcript: String)

  def clusterSize(seed: Long, block: Long): Int = {
    if (block % HeavyEvery == 0L) return BlockSize
    val r = new Rng(mix(seed, block, 1L))
    if (r.nextDouble() < 0.5) 1 else 2 + r.nextInt(3)
  }

  def headParams(seed: Long, block: Long, cc: CorpusConfig): HeadParams = {
    val r = new Rng(mix(seed, block, 2L))
    val sr = if (r.nextDouble() < 0.5) 8000 else 16000
    val dur = cc.durMinMs + r.nextInt(cc.durMaxMs - cc.durMinMs + 1)
    val nSeg = 8 + r.nextInt(12)
    val amps = Array.fill(nSeg)(0.25 + 0.75 * r.nextDouble())
    val nTones = 1 + r.nextInt(3)
    val tones = Array.fill(nTones)(
      (100.0 + r.nextDouble() * (sr / 2.0 - 600.0), 0.5 + 0.5 * r.nextDouble()))
    val nTok = cc.tokensMin + r.nextInt(cc.tokensMax - cc.tokensMin + 1)
    val toks = Array.fill(nTok)(vocab(r.nextInt(VocabSize)))
    HeadParams(sr, dur, amps, tones, toks.mkString(" "))
  }

  /** Clean float signal for the given head params (no noise, no int16). */
  def synth(p: HeadParams): Array[Float] = {
    val n = p.srHz * p.durMs / 1000
    val out = new Array[Float](n)
    val ampSum = p.tones.map(_._2).sum
    var i = 0
    while (i < n) {
      val env = p.segAmps(math.min(p.segAmps.length - 1, i * p.segAmps.length / n))
      var v = 0.0
      p.tones.foreach { case (f, a) =>
        v += a * math.sin(2.0 * math.Pi * f * i / p.srHz)
      }
      out(i) = (0.6 * env * v / ampSum).toFloat
      i += 1
    }
    out
  }

  private def substituteTokens(transcript: String, frac: Double, r: Rng): String = {
    val toks = transcript.split(" ")
    val k = math.max(1, math.ceil(toks.length * frac).toInt)
    val idxs = scala.collection.mutable.HashSet[Int]()
    while (idxs.size < math.min(k, toks.length)) idxs += r.nextInt(toks.length)
    idxs.foreach(i => toks(i) = vocab(r.nextInt(VocabSize)))
    toks.mkString(" ")
  }

  private def freshTranscript(r: Rng, cc: CorpusConfig): String = {
    val nTok = cc.tokensMin + r.nextInt(cc.tokensMax - cc.tokensMin + 1)
    Array.fill(nTok)(vocab(r.nextInt(VocabSize))).mkString(" ")
  }

  private def addNoiseSnr(clean: Array[Float], snrDb: Double, r: Rng): Array[Float] = {
    var energy = 0.0
    clean.foreach(x => energy += x.toDouble * x)
    val rms = math.sqrt(energy / math.max(1, clean.length))
    val sigma = rms / math.pow(10.0, snrDb / 20.0)
    clean.map { x =>
      val v = x + sigma * r.nextGaussian()
      math.max(-0.999, math.min(0.999, v)).toFloat
    }
  }

  val kinds: Array[String] = Array("exact", "near_audio", "near_text", "containment")

  def kindOf(seed: Long, i: Long): String = {
    val block = i / BlockSize
    val j = (i % BlockSize).toInt
    val m = clusterSize(seed, block)
    if (j >= m) { if (m == 1 || j > 0) "distractor" else "head" }
    else if (j == 0) { if (m == 1) "distractor" else "head" }
    else kinds((j - 1) % kinds.length)
  }

  def clusterOf(seed: Long, i: Long): Long = {
    val block = i / BlockSize
    val j = (i % BlockSize).toInt
    val m = clusterSize(seed, block)
    if (m >= 2 && j < m) block else -1L
  }

  /** Generate row i; pure function of (seed, i). */
  def genClip(cc: CorpusConfig, i: Long): Clip = {
    val seed = cc.seed
    val block = i / BlockSize
    val kind = kindOf(seed, i)
    val id = f"clip_$i%08d"
    val rv = new Rng(mix(seed, i, 4L))
    val head = headParams(seed, block, cc)

    def distractorClip(): Clip = {
      val own = headParams(seed, mix(seed, i, 5L), cc)
      val base = freshTranscript(rv, cc)
      val transcript =
        if (i % 37 == 0) Boilerplate + " " + base else base
      Clip(id, AudioPcm.encodeJvm(synth(own)), own.srHz, own.durMs, "pcm_s16le", transcript)
    }

    kind match {
      case "head" | "exact" =>
        Clip(id, AudioPcm.encodeJvm(synth(head)), head.srHz, head.durMs,
          "pcm_s16le", head.transcript)
      case "near_audio" =>
        val noisy = addNoiseSnr(synth(head), 35.0, rv)
        Clip(id, AudioPcm.encodeJvm(noisy), head.srHz, head.durMs,
          "pcm_s16le", substituteTokens(head.transcript, 0.5, rv))
      case "near_text" =>
        val own = headParams(seed, mix(seed, i, 5L), cc)
        Clip(id, AudioPcm.encodeJvm(synth(own)), own.srHz, own.durMs,
          "pcm_s16le", substituteTokens(head.transcript, 0.08, rv))
      case "containment" =>
        val own = headParams(seed, mix(seed, i, 5L), cc)
        val fresh = freshTranscript(rv, cc).split(" ")
        val half = fresh.length / 2
        val embedded = head.transcript.substring(0, math.min(100, head.transcript.length))
        val transcript = (fresh.take(half) :+ embedded).++(fresh.drop(half)).mkString(" ")
        Clip(id, AudioPcm.encodeJvm(synth(own)), own.srHz, own.durMs,
          "pcm_s16le", transcript)
      case _ => distractorClip()
    }
  }

  /** Clean (pre-noise, pre-int16) reference signal for row i — SNR oracle. */
  def cleanSamples(cc: CorpusConfig, i: Long): Array[Float] = {
    val seed = cc.seed
    val block = i / BlockSize
    kindOf(seed, i) match {
      case "head" | "exact" | "near_audio" => synth(headParams(seed, block, cc))
      case "near_text" | "containment" => synth(headParams(seed, mix(seed, i, 5L), cc))
      case _ => synth(headParams(seed, mix(seed, i, 5L), cc))
    }
  }

  def golden(cc: CorpusConfig, i: Long): GoldenLabel =
    GoldenLabel(f"clip_$i%08d", clusterOf(cc.seed, i), kindOf(cc.seed, i))

  // ---- Spark datasets ----
  def clips(spark: SparkSession, cc: CorpusConfig): Dataset[Clip] = {
    import spark.implicits._
    val conf = cc
    // 4x over-partitioning: row generation and the signature projection that
    // inherits this partitioning run long per-row kernels, and cores-sized
    // tasks turn every straggler into idle cores at the end of the stage
    spark.range(0, conf.n, 1, 4 * spark.sparkContext.defaultParallelism)
      .mapPartitions(_.map(i => genClip(conf, i)))
  }

  /** Clips for an id sub-range of a larger corpus config (delta batches for
    * incremental tests/profiling — same content as `clips` of the full
    * range, restricted to [from, to)). */
  def clipsRange(spark: SparkSession, cc: CorpusConfig, from: Long,
                 to: Long): Dataset[Clip] = {
    import spark.implicits._
    val conf = cc
    spark.range(from, to, 1, spark.sparkContext.defaultParallelism)
      .mapPartitions(_.map(i => genClip(conf, i)))
  }

  def goldenLabels(spark: SparkSession, cc: CorpusConfig): Dataset[GoldenLabel] = {
    import spark.implicits._
    val conf = cc
    spark.range(0, conf.n, 1, spark.sparkContext.defaultParallelism)
      .mapPartitions(_.map(i => golden(conf, i)))
  }
}
