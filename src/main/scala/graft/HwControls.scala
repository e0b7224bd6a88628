package graft

/** Hardware-ceiling micro-controls run alongside the scaling probe: what the
  * HOST delivers N vs 4N threads for pure-CPU, memory-stream, and
  * allocation work. A single-node N-vs-4N probe shares one memory system —
  * real 4N EXECUTORS each bring their own — so the job's wall-clock scaling
  * is bounded by these, and the bench reports efficiency both raw and
  * normalized. */
object HwControls {
  def mix64(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Raw-CPU control: aggregate mix64 ops/sec over `threads` pinned-busy JVM
    * threads for `ms` — no Spark, no allocation, no memory traffic. Measures
    * what the HOST gives N vs 4N threads (vcpu oversubscription, frequency
    * scaling): the hardware ceiling the job's scaling efficiency is bounded
    * by. Run interleaved with the probes so both see the same drift. */
  def cpuOps(threads: Int, ms: Long): Double = {
    val stop = System.nanoTime() + ms * 1000000L
    val counts = new java.util.concurrent.atomic.AtomicLongArray(threads)
    val ts = (0 until threads).map { t =>
      new Thread(() => {
        var x = 0x9e3779b97f4a7c15L + t
        var n = 0L
        while (System.nanoTime() < stop) {
          var i = 0
          while (i < 100000) { x = mix64(x); i += 1 }
          n += 100000
        }
        counts.set(t, if (x == 42) -1L else n) // keep x live
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    (0 until threads).map(counts.get).sum / (ms / 1000.0)
  }

  /** Memory-stream control: aggregate GB/s of sequential xor-folds over
    * per-thread 64 MB arrays (far beyond LLC). The dedup kernels stream
    * shingle/byte arrays, so DRAM bandwidth — which does NOT grow with
    * thread count — is the ceiling the register-only control misses. */
  def memGBps(threads: Int, ms: Long): Double = {
    val words = 8 * 1024 * 1024 // 64 MB / thread
    val stop = System.nanoTime() + ms * 1000000L
    val counts = new java.util.concurrent.atomic.AtomicLongArray(threads)
    val ts = (0 until threads).map { t =>
      new Thread(() => {
        val a = new Array[Long](words)
        java.util.Arrays.fill(a, t.toLong)
        var x = 0L; var bytes = 0L
        while (System.nanoTime() < stop) {
          var i = 0
          while (i < words) { x ^= a(i); i += 1 }
          bytes += words.toLong * 8
        }
        counts.set(t, if (x == 42) -1L else bytes)
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    (0 until threads).map(counts.get).sum / (ms / 1000.0) / 1e9
  }

  /** Allocation control: short-lived Array[Long] churn (the per-row shingle
    * buffers of the signature kernels) — measures whether young-gen GC
    * throughput scales with mutator threads. */
  def allocOps(threads: Int, ms: Long): Double = {
    val stop = System.nanoTime() + ms * 1000000L
    val counts = new java.util.concurrent.atomic.AtomicLongArray(threads)
    val ts = (0 until threads).map { t =>
      new Thread(() => {
        var h = t.toLong; var n = 0L
        while (System.nanoTime() < stop) {
          var i = 0
          while (i < 100) {
            val a = new Array[Long](2048)
            a((h & 2047L).toInt) = h
            h += a(((h >> 3) & 2047L).toInt) + i
            i += 1
          }
          n += 100
        }
        counts.set(t, if (h == 42) -1L else n)
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    (0 until threads).map(counts.get).sum / (ms / 1000.0)
  }

}

/** Dev main: print the three controls at several thread counts. */
object HwControlsMain {
  def main(args: Array[String]): Unit = {
    val threads = if (args.nonEmpty) args(0).split(",").map(_.toInt).toSeq
      else Seq(4, 16, 32)
    threads.foreach { t =>
      val c = HwControls.cpuOps(t, 3000) / 1e6
      val m = HwControls.memGBps(t, 3000)
      val a = HwControls.allocOps(t, 3000) / 1e6
      println(f"[hw] threads=$t%2d cpu=$c%9.1f Mops  mem=$m%6.1f GB/s  alloc=$a%8.2f Mops")
    }
  }
}
