package graft

import graft.config.DedupConfig
import graft.pipeline.DedupPipeline
import graft.sources.{ClipCorpus, CorpusConfig}
import org.apache.spark.sql.functions._

/**
 * End-to-end correctness: the pipeline must reproduce the planted cluster
 * assignments with dup-pair recall >= 0.99 and keep distractors out
 * (BASELINE.json metric; FIXTURES.md §2-3). Recall is measured on golden
 * intra-cluster pairs being co-clustered AFTER connected components, which is
 * the reference's cluster-assignment semantics (utils/util.py:237-305).
 */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  val cc = CorpusConfig(seed = 42L, n = 1000L)
  val cfg = DedupConfig.default

  lazy val result = DedupPipeline.run(spark, ClipCorpus.clips(spark, cc).toDF(), cfg)
  lazy val golden = ClipCorpus.goldenLabels(spark, cc).toDF()

  test("dup-pair recall vs planted clusters >= 0.99") {
    val members = golden.filter($"cluster_id" >= 0)
    val goldenPairs = members.as("x").join(members.as("y"), "cluster_id")
      .filter($"x.clip_id" < $"y.clip_id")
      .select($"x.clip_id".as("a"), $"y.clip_id".as("b"))
    val assign = result.clusters.select($"node".as("clip_id"), $"component")
    val found = goldenPairs
      .join(assign.withColumnRenamed("clip_id", "a").withColumnRenamed("component", "ca"), "a")
      .join(assign.withColumnRenamed("clip_id", "b").withColumnRenamed("component", "cb"), "b")
      .filter($"ca" === $"cb")
    val total = goldenPairs.count()
    val hit = found.count()
    val recall = hit.toDouble / total
    info(s"golden pairs: $total, co-clustered: $hit, recall: $recall")
    assert(total > 100, "fixture sanity: enough golden pairs")
    assert(recall >= 0.99, s"recall $recall < 0.99 ($hit/$total)")
  }

  test("precision: predicted co-clustered pairs are golden pairs (no distractor leakage)") {
    val assign = result.clusters.select($"node".as("clip_id"), $"component")
    val predPairs = assign.as("x").join(assign.as("y"), "component")
      .filter($"x.clip_id" < $"y.clip_id")
      .select($"x.clip_id".as("a"), $"y.clip_id".as("b"))
    val members = golden.filter($"cluster_id" >= 0)
    val goldenPairs = members.as("x").join(members.as("y"), "cluster_id")
      .filter($"x.clip_id" < $"y.clip_id")
      .select($"x.clip_id".as("a"), $"y.clip_id".as("b"))
    val nPred = predPairs.count()
    val falsePos = predPairs.join(goldenPairs, Seq("a", "b"), "left_anti").count()
    val precision = 1.0 - falsePos.toDouble / math.max(1, nPred)
    info(s"predicted pairs: $nPred, false: $falsePos, precision: $precision")
    assert(precision >= 0.97, s"precision $precision < 0.97")
  }

  test("per-method pairs exist (every planted kind is caught by its stage)") {
    val methods = result.dupPairs.groupBy("method").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    info(s"pairs by method: $methods")
    assert(methods.getOrElse("exact", 0L) > 0, "exact pairs")
    assert(methods.getOrElse("text_minhash", 0L) > 0, "text minhash pairs")
    assert(methods.getOrElse("audio_minhash", 0L) > 0, "audio minhash pairs")
    assert(methods.getOrElse("containment", 0L) > 0, "containment pairs")
  }

  test("metrics are recorded for every stage (no silent caps)") {
    val stages = result.metrics.map(_.stage).toSet
    assert(stages.contains("signatures") && stages.contains("dup_pairs"))
    assert(stages.exists(_.contains("dropped")))
  }
}
