package graft

import graft.config.DedupConfig
import graft.pipeline.DedupPipeline
import graft.sources.{ClipCorpus, CorpusConfig}
import org.apache.spark.sql.functions._

/** Dev-only: isolate the SIGNATURE stage's 1-vs-4-core scaling. The full-
  * pipeline DevScale run attributed the scaling loss to this stage (2.7x
  * CPU inflation at 4 cores vs 1.15x for everything else); this main times
  * the stage alone, interleaved reps, in two forms:
  *   compute  — signatures() drained by an aggregate (no materialization):
  *              isolates the kernel + cache-read path
  *   ckpt     — signatures().localCheckpoint(eager): adds the block-store
  *              write, i.e. what the pipeline actually does
  * Usage: runMain graft.DevSig <nClips> <reps> */
object DevSig {
  def main(args: Array[String]): Unit = {
    HwControls.warmHeap(0.6)
    HwControls.warmPages(
      sys.env.getOrElse("SPARK_GRAFT_WARM_GB", "48").toDouble, 32): Unit
    val n = if (args.length > 0) args(0).toLong else 100000L
    val reps = if (args.length > 1) args(1).toInt else 3

    val stageDir = SparkUtil.localDir + "/dev-sig-corpus"
    val s0 = SparkUtil.session(32, "dev-sig-stage")
    ClipCorpus.clips(s0, CorpusConfig(seed = 42L, n = n)).toDF()
      .write.mode("overwrite").parquet(stageDir)
    s0.stop()

    def leg(cores: Int): (Double, Double) = {
      val spark = SparkUtil.session(cores, s"dev-sig-$cores",
        aqe = Some(false), shufflePartitions = Some(8),
        aqeCoalesce = Some(false))
      val clips = spark.read.parquet(stageDir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      clips.count()
      val sigsDf = DedupPipeline.signatures(spark, clips, DedupConfig.default)
      // compute-only: drain every column through an aggregate
      val t0 = System.nanoTime()
      sigsDf.agg(
        sum(length(col("sha"))),
        sum(size(col("ashingles"))), sum(size(col("cfps"))),
        expr("bit_xor(simhash)"), expr("bit_xor(element_at(tsig, 1))"),
        expr("bit_xor(element_at(asig, 1))")).collect()
      val tCompute = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val cp = sigsDf.localCheckpoint(eager = true)
      cp.count()
      val tCkpt = (System.nanoTime() - t1) / 1e9
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.stop()
      (tCompute, tCkpt)
    }

    (0 until reps).foreach { r =>
      Seq(1, 4).foreach { cores =>
        val can = HwControls.cpuOps(4, 1000) / 1e6
        val mem = HwControls.memGBps(4, 800)
        val (tc, tk) = leg(cores)
        println(f"[devsig] rep=$r cores=$cores%2d compute=$tc%7.2f ckpt=$tk%7.2f canary=$can%7.1f mem=$mem%5.1f")
      }
    }
    def rmr(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmr))
      f.delete(): Unit
    }
    rmr(new java.io.File(stageDir))
  }
}
