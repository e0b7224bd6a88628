package graft

import graft.config.DedupConfig
import graft.pipeline.DedupPipeline
import graft.sources.{ClipCorpus, CorpusConfig}

/** Dev-only: probe-identical dedup legs at two core counts with a per-stage
  * breakdown (wall / executor-run / cpu / gc, grouped by call site), to see
  * WHICH stages lose 1->4-core scaling efficiency.
  * Usage: runMain graft.DevScale <nClips> <coresA> <coresB> [parts] [aqe on|off]
  */
object DevScale {
  final case class St(site: String, rt: Long, cpu: Long, gc: Long,
                      wall: Long, nt: Int, shufW: Long = 0L, spill: Long = 0L)

  def main(args: Array[String]): Unit = {
    HwControls.warmHeap(0.6)
    HwControls.warmPages(
      sys.env.getOrElse("SPARK_GRAFT_WARM_GB", "48").toDouble, 32): Unit
    val n = args(0).toLong
    val coresA = args(1).toInt
    val coresB = args(2).toInt
    val parts = if (args.length > 3) args(3).toInt else 2 * math.max(coresA, coresB)
    val aqeOn = if (args.length > 4) args(4) == "on" else true
    // SPARK_GRAFT_STRIDES="1" vs "1,33,47": A/B the OR'd audio band
    // groupings' scaling cost at the probe shape (same window, same legs)
    val strides = sys.env.get("SPARK_GRAFT_STRIDES")
      .map { s =>
        val toks = s.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        require(toks.nonEmpty && toks.forall(_.forall(_.isDigit)),
          s"SPARK_GRAFT_STRIDES must be a comma list of positive ints, got '$s'")
        toks.map(_.toInt)
      }
      .getOrElse(DedupConfig.default.audioBandGroupStrides)

    val stageDir = SparkUtil.localDir + "/dev-scale-corpus"
    val s0 = SparkUtil.session(32, "dev-scale-stage")
    ClipCorpus.clips(s0, CorpusConfig(seed = 42L, n = n)).toDF()
      .write.mode("overwrite").parquet(stageDir)
    s0.stop()

    def leg(cores: Int): (Double, Seq[St]) = {
      val spark = SparkUtil.session(cores, s"dev-scale-$cores",
        aqe = Some(aqeOn), shufflePartitions = Some(parts),
        aqeCoalesce = Some(false))
      val stageInfo = new java.util.concurrent.ConcurrentHashMap[Int, St]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val wall = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(0L)
          val site = si.details.split("\n").find(l =>
            l.contains("graft.") && !l.contains("DevScale")).getOrElse(si.name.split("\n")(0)).trim.take(90)
          stageInfo.put(si.stageId, St(site, si.taskMetrics.executorRunTime,
            si.taskMetrics.executorCpuTime / 1000000, si.taskMetrics.jvmGCTime, wall, si.numTasks,
            si.taskMetrics.shuffleWriteMetrics.bytesWritten,
            si.taskMetrics.diskBytesSpilled))
        }
      })
      val clips = spark.read.parquet(stageDir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      clips.count()
      stageInfo.clear()
      val t0 = System.nanoTime()
      DedupPipeline.run(spark, clips,
        DedupConfig.default.copy(collectMetrics = false,
          audioBandGroupStrides = strides)).clusters.count()
      val dt = (System.nanoTime() - t0) / 1e9
      import scala.jdk.CollectionConverters._
      val stages = stageInfo.asScala.values.toSeq
      spark.stop()
      (dt, stages)
    }

    val (tA, stA) = leg(coresA)
    val (tB, stB) = leg(coresB)

    def group(st: Seq[St]): Map[String, St] =
      st.groupBy(_.site).view.mapValues(ss => St(ss.head.site,
        ss.map(_.rt).sum, ss.map(_.cpu).sum, ss.map(_.gc).sum,
        ss.map(_.wall).sum, ss.map(_.nt).sum,
        ss.map(_.shufW).sum, ss.map(_.spill).sum)).toMap

    val gA = group(stA); val gB = group(stB)
    println(f"[devscale] coresA=$coresA sec=$tA%.2f  coresB=$coresB sec=$tB%.2f  raw-eff(${coresB / coresA}x)=${tA / (coresB.toDouble / coresA * tB)}%.3f")
    println(f"[devscale] sum-wall A=${stA.map(_.wall).sum / 1000.0}%.1f B=${stB.map(_.wall).sum / 1000.0}%.1f  sum-run A=${stA.map(_.rt).sum / 1000.0}%.1f B=${stB.map(_.rt).sum / 1000.0}%.1f  sum-cpu A=${stA.map(_.cpu).sum / 1000.0}%.1f B=${stB.map(_.cpu).sum / 1000.0}%.1f  sum-gc A=${stA.map(_.gc).sum / 1000.0}%.1f B=${stB.map(_.gc).sum / 1000.0}%.1f")
    println(f"[devscale] driver-gap A=${tA - stA.map(_.wall).sum / 1000.0}%.1f s  B=${tB - stB.map(_.wall).sum / 1000.0}%.1f s (wall outside stages: planning, barriers)")
    val sites = (gA.keySet ++ gB.keySet).toSeq.sortBy(s => -gA.get(s).map(_.wall).getOrElse(0L))
    println("[devscale] per-site wall (s): A | B | wallEff | cpuA | cpuB | gcA | gcB | runA | runB")
    sites.foreach { s =>
      val a = gA.getOrElse(s, St(s, 0, 0, 0, 0, 0))
      val b = gB.getOrElse(s, St(s, 0, 0, 0, 0, 0))
      val eff = if (b.wall > 0) a.wall.toDouble / (coresB.toDouble / coresA * b.wall) else Double.NaN
      println(f"[devscale]   ${a.wall / 1000.0}%7.2f ${b.wall / 1000.0}%7.2f  $eff%5.2f   ${a.cpu / 1000.0}%6.1f ${b.cpu / 1000.0}%6.1f  ${a.gc / 1000.0}%5.1f ${b.gc / 1000.0}%5.1f  ${a.rt / 1000.0}%6.1f ${b.rt / 1000.0}%6.1f  ${s.take(80)}")
    }
    def rmr(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmr))
      f.delete(): Unit
    }
    rmr(new java.io.File(stageDir))
  }
}
