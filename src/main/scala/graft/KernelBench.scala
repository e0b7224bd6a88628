package graft

import graft.config.DedupConfig
import graft.functions.{AudioPcm, SimHash, Hashing}
import graft.operators.{ContainmentJoin, MinHasher, PairVerifier}
import graft.sources.{ClipCorpus, CorpusConfig}

/** Dev-only single-threaded microbenchmark of the per-row kernels. */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val n = 2000
    val cc = CorpusConfig(seed = 42L, n = n)
    val cfg = DedupConfig.default
    val clips = (0L until n).map(i => ClipCorpus.genClip(cc, i)).toArray

    def time(name: String, per: Int = n)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[kbench] $name%-24s ${dt}%7.2f s total, ${dt / per * 1e3}%8.3f ms/row")
    }

    time("synth(gen)")( (0L until n.toLong).foreach(i => ClipCorpus.genClip(cc, i)) )
    time("sha256")(clips.foreach { c =>
      java.security.MessageDigest.getInstance("SHA-256").digest(c.bytes)
    })
    val ash = new Array[Array[Long]](n)
    time("audioShingles")(clips.zipWithIndex.foreach { case (c, i) =>
      ash(i) = AudioPcm.shingles31Jvm(c.bytes, c.sr_hz, cfg.frameMs, cfg.hopMs,
        cfg.framesPerShingle, cfg.energyLevels)
    })
    println(s"[kbench] avg audio shingles/clip = ${ash.map(_.length.toLong).sum / n}")
    val tsh = new Array[Array[Long]](n)
    time("textShingles(jvm-equiv)")(clips.zipWithIndex.foreach { case (c, i) =>
      val t = c.transcript.toLowerCase
      val k = cfg.charGramK
      val m = math.max(0, t.length - k + 1)
      val buf = new Array[Long](m)
      var o = 0
      while (o < m) { buf(o) = Hashing.md5Hash60Jvm(t.substring(o, o + k)) % Hashing.P; o += 1 }
      tsh(i) = AudioPcm.sortedDistinct(buf, m)
    })
    time("simhash")(clips.foreach(c => SimHash.signatureJvm(SimHash.tokenizeJvm(c.transcript))))
    time("minhash-audio")(ash.foreach(a => MinHasher.signatureJvm(a, cfg.numPerms, cfg.seed)))
    time("minhash-text")(tsh.foreach(a => MinHasher.signatureJvm(a, cfg.numPerms, cfg.seed)))
    time("containment-fp")(clips.foreach(c =>
      ContainmentJoin.fingerprintsJvm(c.transcript.toLowerCase, cfg.containmentMinRun)))
    time("pcmCorr x2000 pairs", 2000)((0 until 2000).foreach { i =>
      PairVerifier.pcmCorrJvm(clips(i % n).bytes, clips((i + 1) % n).bytes)
    })
  }
}
