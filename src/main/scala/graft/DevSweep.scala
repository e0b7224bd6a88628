package graft

import graft.config.DedupConfig
import graft.pipeline.DedupPipeline
import graft.sources.{ClipCorpus, CorpusConfig}

/** Dev-only: flagship scale-trend sweep — the SAME 32-core pipeline
  * (metrics off, bench shape) at several corpus sizes in one session, with
  * clips/s, canaries, and a per-call-site stage rollup per size, so the
  * wall-vs-N trend (linear = healthy) is measured rather than extrapolated.
  * The corpus is staged to parquet once per size and table-scanned, like the
  * bench probe legs.
  * Usage: runMain graft.DevSweep <n1,n2,...> [cores] [reps]
  */
object DevSweep {
  final case class St(site: String, rt: Long, cpu: Long, gc: Long,
                      wall: Long, nt: Int)

  def main(args: Array[String]): Unit = {
    HwControls.warmHeap(0.6)
    HwControls.warmPages(
      sys.env.getOrElse("SPARK_GRAFT_WARM_GB", "48").toDouble, 32): Unit
    val ns = if (args.length > 0) args(0).split(",").toSeq.map(_.trim.toLong)
             else Seq(20000L, 100000L, 500000L)
    val cores = if (args.length > 1) args(1).toInt else 32
    val reps = if (args.length > 2) args(2).toInt else 1
    val spark = SparkUtil.session(cores, "dev-sweep")
    spark.sparkContext.setLogLevel("WARN")
    val stageInfo = new java.util.concurrent.ConcurrentHashMap[Int, St]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(0L)
        val site = si.details.split("\n").find(l =>
          l.contains("graft.") && !l.contains("DevSweep")).getOrElse(si.name.split("\n")(0)).trim.take(90)
        stageInfo.put(si.stageId, St(site, si.taskMetrics.executorRunTime,
          si.taskMetrics.executorCpuTime / 1000000, si.taskMetrics.jvmGCTime, wall, si.numTasks))
      }
    })
    def rmr(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmr))
      f.delete(): Unit
    }
    def purge(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    ns.foreach { n =>
      val stageDir = SparkUtil.localDir + s"/dev-sweep-$n"
      ClipCorpus.clips(spark, CorpusConfig(seed = 42L, n = n)).toDF()
        .write.mode("overwrite").parquet(stageDir)
      (1 to reps).foreach { rep =>
        purge()
        val clips = spark.read.parquet(stageDir)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        clips.count()
        val can = HwControls.cpuOps(4, 1000) / 1e6
        val mem = HwControls.memGBps(4, 800)
        stageInfo.clear()
        val t0 = System.nanoTime()
        DedupPipeline.run(spark, clips,
          DedupConfig.default.copy(collectMetrics = false)).clusters.count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500) // listener drain
        import scala.jdk.CollectionConverters._
        val stages = stageInfo.asScala.values.toSeq
        println(f"[devsweep] n=$n%-7d rep=$rep wall=$wall%8.2f s  clips/s=${n / wall}%7.1f  canary=$can%7.1f mem=$mem%5.1f  stages=${stages.size} sum-run=${stages.map(_.rt).sum / 1000.0}%.1f sum-cpu=${stages.map(_.cpu).sum / 1000.0}%.1f sum-gc=${stages.map(_.gc).sum / 1000.0}%.1f")
        stages.groupBy(_.site).view.mapValues(ss => (ss.map(_.wall).sum,
            ss.map(_.cpu).sum, ss.map(_.rt).sum)).toSeq
          .sortBy(-_._2._1).take(10).foreach { case (site, (w, c, r)) =>
            println(f"[devsweep]   n=$n%-7d wall=${w / 1000.0}%7.2f cpu=${c / 1000.0}%7.1f run=${r / 1000.0}%7.1f  ${site.take(76)}")
          }
      }
      purge()
      rmr(new java.io.File(stageDir))
    }
    spark.stop()
  }
}
