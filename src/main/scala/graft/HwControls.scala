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

  /** First-touch page-fault control: GB/s at which the HOST maps NEW memory.
    * On lazily-backed VMs (balloon/UFFD snapshot restore) the first touch of
    * a page can cost ~100 us — ~10 MB/s/thread — while re-used pages are
    * normal speed. A Spark job's footprint growth (heap, page cache, tmpfs
    * shuffle files) then crawls at the fault rate REGARDLESS of CPU speed:
    * measured on this sandbox's VM, the identical dedup leg ran 967 s cold
    * vs ~100 s warm with IDENTICAL cpu/mem canaries (first-touch 0.01 vs
    * >1 GB/s). The cpu/mem canaries cannot see this — they touch a few MB
    * that fault once — so the bench measures fault rate explicitly and
    * warms the VM before timing anything. Off-heap regions are used (and
    * freed immediately) so the probe never disturbs the JVM heap; a page
    * faulted once stays cheap for the VM's lifetime even after release. */
  def faultGBps(threads: Int, gbTotal: Double,
                capMs: Long = 60000): Double = {
    val perThread = math.max(1L, (gbTotal * 1e9).toLong / threads)
    val deadline = System.nanoTime() + capMs * 1000000L
    val touched = new java.util.concurrent.atomic.AtomicLongArray(threads)
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { t =>
      new Thread(() => touched.set(t, touchFresh(perThread, deadline)))
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    (0 until threads).map(touched.get).sum /
      ((System.nanoTime() - t0) / 1e9) / 1e9
  }

  /** Touch up to `bytes` of freshly-allocated off-heap memory (one write per
    * 4 KB page), releasing each chunk as soon as it is touched; stops at
    * `deadline` (a host faulting at ~10 MB/s must not turn a warm-up into an
    * hour — the cap bounds the bill while still reporting the honest rate).
    * Returns bytes actually touched. */
  private def touchFresh(bytes: Long, deadline: Long): Long = {
    val chunk = 256 * 1024 * 1024
    var left = bytes
    var done = 0L
    while (left > 0 && System.nanoTime() < deadline) {
      val sz = math.min(chunk.toLong, left).toInt
      val buf = java.nio.ByteBuffer.allocateDirect(sz)
      var i = 0
      while (i < sz && (i % (16 * 1024 * 1024) != 0 ||
          System.nanoTime() < deadline)) {
        buf.put(i, 1.toByte); i += 4096
      }
      freeDirect(buf)
      done += i
      left -= sz
    }
    done
  }

  /** Release a direct buffer's native memory NOW (not at GC): pages faulted
    * in stay warm guest-wide after munmap, so warming costs no footprint. */
  private def freeDirect(buf: java.nio.ByteBuffer): Unit =
    try {
      val f = classOf[sun.misc.Unsafe].getDeclaredField("theUnsafe")
      f.setAccessible(true)
      f.get(null).asInstanceOf[sun.misc.Unsafe].invokeCleaner(buf)
    } catch { case _: Throwable => () } // GC will reclaim it eventually

  /** Warm the VM's memory: fault in up to `gb` across `threads` within
    * `capMs`, releasing as it goes. Returns the measured aggregate fault
    * rate (GB/s). */
  def warmPages(gb: Double, threads: Int, capMs: Long = 240000): Double =
    faultGBps(threads, gb, capMs)

  /** Fault in the JVM's OWN heap up to `frac` of -Xmx by allocating (and
    * dropping) page-touching arrays across threads, bounded by `capMs`.
    * With -Xms = -Xmx, G1 never uncommits these regions, so the pages stay
    * warm for the JVM's lifetime — unlike `warmPages`' off-heap regions,
    * which return to the hypervisor-stealable free pool on release. */
  def warmHeap(frac: Double, capMs: Long = 240000): Unit = {
    val target = (Runtime.getRuntime.maxMemory() * frac).toLong
    val perChunk = 32 * 1024 * 1024
    val nThreads = 8
    val deadline = System.nanoTime() + capMs * 1000000L
    val chunksLeft = new java.util.concurrent.atomic.AtomicLong(target / perChunk)
    val ts = (0 until nThreads).map { _ =>
      new Thread(() => {
        // hold this thread's chunks until every thread finishes allocating,
        // so the heap actually EXPANDS to target instead of GC recycling the
        // same young regions
        val held = scala.collection.mutable.ArrayBuffer[Array[Long]]()
        while (chunksLeft.getAndDecrement() > 0 &&
            System.nanoTime() < deadline) {
          val a = new Array[Long](perChunk / 8)
          var i = 0
          while (i < a.length) { a(i) = i.toLong; i += 512 } // one write per 4 KB
          held += a
        }
        if (held.length == -1) println(held.length) // keep `held` live
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
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
      val fr = HwControls.faultGBps(t, 1.0)
      println(f"[hw] threads=$t%2d cpu=$c%9.1f Mops  mem=$m%6.1f GB/s  alloc=$a%8.2f Mops  fault=$fr%6.2f GB/s")
    }
  }
}
