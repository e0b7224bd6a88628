package graft

import graft.config.DedupConfig
import graft.pipeline.DedupPipeline
import graft.sources.{ClipCorpus, CorpusConfig, LakeTable}
import org.apache.spark.sql.functions._

/** North-rule resume-from-checkpoint: with stageRoot set, the signature
  * stage is a committed LakeTable snapshot; a re-run over the same input
  * reuses it (no re-sign, no new commit), and a changed input re-signs. */
class ResumeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Long) = {
    val conf = CorpusConfig(seed = 42L, n = n)
    spark.range(0, conf.n, 1, 2)
      .mapPartitions(_.map(i => ClipCorpus.genClip(conf, i))).toDF()
  }

  test("same input resumes from the committed signature stage") {
    val root = java.nio.file.Files.createTempDirectory("graft-stage").toString
    val cfg = DedupConfig.default.copy(stageRoot = Some(root))
    val stage = new LakeTable(root, "signatures_stage")

    val r1 = DedupPipeline.run(spark, corpus(120), cfg)
    val c1 = r1.clusters.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(stage.currentVersion == 0)

    val r2 = DedupPipeline.run(spark, corpus(120), cfg)
    val c2 = r2.clusters.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(stage.currentVersion == 0, "re-run must NOT re-commit the stage")
    assert(c1 == c2, "resumed run must produce identical clusters")

    // changed input (different fingerprint) re-signs and commits a new version
    DedupPipeline.run(spark, corpus(140), cfg)
    assert(stage.currentVersion == 1, "changed input must re-sign")
    assert(stage.read(spark).count() == 140)
    Seq(r1, r2).foreach(r => r.dupPairs.unpersist())
  }

  test("same ids with different content re-sign (content-sensitive fingerprint)") {
    val root = java.nio.file.Files.createTempDirectory("graft-stage").toString
    val cfg = DedupConfig.default.copy(stageRoot = Some(root))
    val stage = new LakeTable(root, "signatures_stage")
    DedupPipeline.run(spark, corpus(60), cfg).dupPairs.unpersist()
    assert(stage.currentVersion == 0)
    // same clip_ids, mutated bytes AND transcripts: an id-only fingerprint
    // would resume the stale stage and cluster against dead signatures
    val mutated = corpus(60).collect().map { r =>
      sources.Clip(r.getString(0), r.getAs[Array[Byte]]("bytes").map(b => (b ^ 0x5a).toByte),
        r.getInt(2), r.getInt(3), r.getString(4), r.getString(5) + " extra")
    }.toSeq.toDF()
    DedupPipeline.run(spark, mutated, cfg).dupPairs.unpersist()
    assert(stage.currentVersion == 1, "changed content under same ids must re-sign")
  }

  test("changed signature config re-signs (config hash in the fingerprint)") {
    val root = java.nio.file.Files.createTempDirectory("graft-stage").toString
    val cfg = DedupConfig.default.copy(stageRoot = Some(root))
    val stage = new LakeTable(root, "signatures_stage")
    DedupPipeline.run(spark, corpus(60), cfg).dupPairs.unpersist()
    assert(stage.currentVersion == 0)
    val retuned = cfg.copy(charGramK = 6)
    DedupPipeline.run(spark, corpus(60), retuned).dupPairs.unpersist()
    assert(stage.currentVersion == 1, "re-tuned config must not reuse old signatures")
  }
}
