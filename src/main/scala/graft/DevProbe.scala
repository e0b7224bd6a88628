package graft

import graft.config.DedupConfig
import graft.pipeline.DedupPipeline
import graft.sources.{ClipCorpus, CorpusConfig}

/** Dev-only: time single dedup legs at given (cores, shufflePartitions[,aqe])
  * combos over one staged corpus — for tuning the scaling probe's shape.
  * Usage: runMain graft.DevProbe <nClips> <cores:parts[:on|off],...> */
object DevProbe {
  def main(args: Array[String]): Unit = {
    // same VM warm-up as Bench: without it, leg times measure the
    // hypervisor's page-fault path, not the engine (967 s vs ~100 s for the
    // identical leg, at identical cpu canaries)
    HwControls.warmHeap(0.6)
    HwControls.warmPages(
      sys.env.getOrElse("SPARK_GRAFT_WARM_GB", "48").toDouble, 32): Unit
    val n = args(0).toLong
    val combos = args(1).split(",").map { s =>
      val parts = s.split(":")
      (parts(0).toInt, parts(1).toInt,
        if (parts.length > 2) parts(2) == "on" else true)
    }
    val stageDir = SparkUtil.localDir + "/dev-probe-corpus"
    val s0 = SparkUtil.session(32, "dev-probe-stage")
    ClipCorpus.clips(s0, CorpusConfig(seed = 42L, n = n)).toDF()
      .write.mode("overwrite").parquet(stageDir)
    s0.stop()
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    combos.foreach { case (cores, parts, aqeOn) =>
      val canary = HwControls.cpuOps(4, 1500) / 1e6
      val memCan = HwControls.memGBps(4, 1000)
      // per-leg free-pool pre-fault, untimed — mirrors Bench.probe
      HwControls.warmPages(
        sys.env.getOrElse("SPARK_GRAFT_WARM_LEG_GB", "8").toDouble, 16, 45000): Unit
      val gc0 = gcMs
      val spark = SparkUtil.session(cores, s"dev-probe-$cores",
        aqe = Some(aqeOn), shufflePartitions = Some(parts),
        aqeCoalesce = Some(false))
      val clips = spark.read.parquet(stageDir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      clips.count()
      val t0 = System.nanoTime()
      DedupPipeline.run(spark, clips,
        DedupConfig.default.copy(collectMetrics = false)).clusters.count()
      val dt = (System.nanoTime() - t0) / 1e9
      val gcSec = (gcMs - gc0) / 1e3
      println(f"[devprobe] cores=$cores%2d parts=$parts%3d aqe=$aqeOn n=$n sec=$dt%8.2f gc=$gcSec%6.2f canary=$canary%7.1f mem=$memCan%5.1f")
      spark.stop()
    }
    def rmr(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmr))
      f.delete(): Unit
    }
    rmr(new java.io.File(stageDir))
  }
}
