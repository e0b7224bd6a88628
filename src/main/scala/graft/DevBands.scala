package graft

import graft.config.DedupConfig
import graft.pipeline.DedupPipeline
import graft.sources.{ClipCorpus, CorpusConfig}
import org.apache.spark.sql.functions._

/** Dev-only: A/B the audio band-grouping variants (DedupConfig
  * .audioBandGroupStrides) on one corpus in one session — full-pipeline wall,
  * candidate mass, and dup-pair counts per variant, interleaved with
  * canaries so a host drift is visible.
  * Usage: runMain graft.DevBands <nClips> <reps> [cores] */
object DevBands {
  def main(args: Array[String]): Unit = {
    HwControls.warmHeap(0.6)
    HwControls.warmPages(
      sys.env.getOrElse("SPARK_GRAFT_WARM_GB", "24").toDouble, 32): Unit
    val n = if (args.length > 0) args(0).toLong else 20000L
    val reps = if (args.length > 1) args(1).toInt else 2
    val cores = if (args.length > 2) args(2).toInt else 32
    val variants = Seq(
      "G1" -> Seq(1),
      "G2" -> Seq(1, 33),
      "G3" -> Seq(1, 33, 47))
    val spark = SparkUtil.session(cores, "dev-bands")
    spark.sparkContext.setLogLevel("WARN")
    val clips = ClipCorpus.clips(spark, CorpusConfig(seed = 42L, n = n)).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    clips.count()
    (1 to reps).foreach { rep =>
      variants.foreach { case (tag, strides) =>
        val cfg = DedupConfig.default.copy(
          collectMetrics = false, audioBandGroupStrides = strides)
        val can = HwControls.cpuOps(4, 1000) / 1e6
        val mem = HwControls.memGBps(4, 800)
        val t0 = System.nanoTime()
        val res = DedupPipeline.run(spark, clips, cfg)
        val nClusters = res.clusters.count()
        val wall = (System.nanoTime() - t0) / 1e9
        val nPairs = res.dupPairs.count()
        // candidate mass of the fused LSH stage alone, for the disclosure
        val sigs = res.signatures
        val (cands, _) = graft.operators.LshCandidates.fusedCandidatePairsKeys(Seq(
          "audio" -> graft.operators.LshCandidates.bandKeysHashedGrouped(
            sigs.filter(col("asig").isNotNull)
              .select(col("clip_id"), col("asig").as("sig")),
            "clip_id", cfg.audioBands, cfg.audioRowsPerBand, cfg.numPerms,
            strides)),
          "clip_id", cfg.maxBucketSize, cfg.lshSaltChunk)
        val nCands = cands.count()
        println(f"[devbands] rep=$rep $tag%-3s wall=$wall%7.2f s clusters=$nClusters%6d pairs=$nPairs%7d audioCands=$nCands%8d canary=$can%7.1f mem=$mem%5.1f")
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        clips.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        clips.count(): Unit
      }
    }
    spark.stop()
  }
}
