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
}
