package graft

import graft.config.DedupConfig
import graft.operators.PairVerifier
import graft.pipeline.DedupPipeline
import graft.sources.{ClipCorpus, CorpusConfig}
import org.apache.spark.sql.functions._

/** Dev-only: dump the EXECUTED plan of one verify layer (the floor's
  * dominant job shape) to see whether the fa/fb feature-side broadcast
  * builds are exchange-reused or duplicated — the candidate floor cut named
  * in OPTIMIZATION_r06 "Not yet optimized".
  * Usage: runMain graft.DevVerifyPlan [nClips] [cores] */
object DevVerifyPlan {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000L
    val cores = if (args.length > 1) args(1).toInt else 8
    val spark = SparkUtil.session(cores, "dev-verify-plan")
    spark.sparkContext.setLogLevel("WARN")
    val cfg = DedupConfig.default
    val clips = ClipCorpus.clips(spark, CorpusConfig(seed = 42L, n = n)).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    clips.count()
    // a small literal candidate-pair relation, checkpointed like tCands is
    val ids = clips.select("clip_id").limit(40).collect().map(_.getString(0))
    import spark.implicits._
    val pairs = ids.sliding(2, 2).collect { case Array(a, b) =>
      if (a < b) (a, b) else (b, a)
    }.toSeq.toDF("a", "b").localCheckpoint(eager = true)
    val tsh = clips.select(col("clip_id"),
      DedupPipeline.textShingleCol(cfg).as("tshingles"))
    val verified = PairVerifier.verify(pairs, tsh, "clip_id", "tshingles",
      cfg.textJaccardThreshold, "text_minhash")
    verified.count() // execute so AQE finalizes the plan
    val qe = verified.queryExecution
    println("########## text-verify layer, executed plan")
    println(qe.explainString(org.apache.spark.sql.execution.FormattedMode))
    // the FINAL adaptive plan (post-execution): shows whether the duplicate
    // broadcast subtrees were stage-reused at runtime
    println("########## final adaptive physical plan (toString)")
    println(qe.executedPlan.toString.take(8000))
    spark.stop()
  }
}
