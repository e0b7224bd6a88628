package graft

import graft.functions.AudioPcm
import graft.sources.{ClipCorpus, CorpusConfig}

/** Generator invariants: determinism, the decoded-PCM SNR >= 30 dB row
  * invariant, transcript stability (BASELINE.json input_hint). */
class CorpusSpec extends SparkSpec {
  val cc = CorpusConfig(seed = 42L, n = 200L)

  test("row generation is deterministic and partition-independent") {
    val a = ClipCorpus.genClip(cc, 17L)
    val b = ClipCorpus.genClip(cc, 17L)
    assert(a.transcript == b.transcript)
    assert(java.util.Arrays.equals(a.bytes, b.bytes))
    // via Spark, different parallelism, same rows
    val one = ClipCorpus.clips(spark, cc).collect().sortBy(_.clip_id)
    val again = ClipCorpus.clips(spark, cc).repartition(7).collect().sortBy(_.clip_id)
    assert(one.length == 200)
    one.zip(again).foreach { case (x, y) =>
      assert(x.clip_id == y.clip_id && x.transcript == y.transcript)
      assert(java.util.Arrays.equals(x.bytes, y.bytes))
    }
  }

  test("decoded PCM meets the SNR >= 30 dB invariant vs the clean signal") {
    (0L until 200L).foreach { i =>
      val clip = ClipCorpus.genClip(cc, i)
      val decoded = AudioPcm.decodeJvm(clip.bytes)
      val clean = ClipCorpus.cleanSamples(cc, i)
      assert(decoded.length == clean.length, s"row $i length")
      val snr = AudioPcm.snrDb(clean, decoded)
      assert(snr >= 30.0, s"row $i (${ClipCorpus.kindOf(cc.seed, i)}): SNR $snr dB")
    }
  }

  test("pcm encode/decode round-trips int16 exactly") {
    val r = new ClipCorpus.Rng(7L)
    val samples = Array.fill(1000)((r.nextDouble() * 1.9 - 0.95).toFloat)
    val decoded = AudioPcm.decodeJvm(AudioPcm.encodeJvm(samples))
    val redecoded = AudioPcm.decodeJvm(AudioPcm.encodeJvm(decoded))
    assert(java.util.Arrays.equals(
      decoded.map(java.lang.Float.floatToIntBits),
      redecoded.map(java.lang.Float.floatToIntBits)))
  }

  test("planted kinds appear and exact variants are byte-identical to head") {
    val kinds = (0L until 200L).map(i => ClipCorpus.kindOf(cc.seed, i)).toSet
    assert(kinds.contains("head") && kinds.contains("exact") &&
      kinds.contains("near_audio") && kinds.contains("near_text") &&
      kinds.contains("containment") && kinds.contains("distractor"))
    (0L until 200L).filter(i => ClipCorpus.kindOf(cc.seed, i) == "exact").foreach { i =>
      val head = (i / 10) * 10
      assert(ClipCorpus.kindOf(cc.seed, head) == "head")
      assert(java.util.Arrays.equals(
        ClipCorpus.genClip(cc, i).bytes, ClipCorpus.genClip(cc, head).bytes))
    }
  }

  test("containment variants embed a >= 70-char verbatim head substring") {
    (0L until 200L).filter(i => ClipCorpus.kindOf(cc.seed, i) == "containment").foreach { i =>
      val head = ClipCorpus.genClip(cc, (i / 10) * 10)
      val v = ClipCorpus.genClip(cc, i)
      val run = graft.operators.ContainmentJoin.longestCommonRunJvm(head.transcript, v.transcript)
      assert(run >= 70, s"row $i shared run $run")
    }
  }
}
