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

  test("exact-group representative filter: near-dup pairs extend to every copy, pair count stays linear") {
    // 50 identical copies of one clip + a 35 dB near-dup + distractors.
    // Near-dup candidate generation runs on ONE rep per exact group, so the
    // dup-pair table must stay ~linear in group size (star edges + one rep
    // pair), while CC transitivity still puts all 51 in one cluster.
    import graft.functions.AudioPcm
    val sr = 16000
    def sine(freq: Double, amp: Double, n: Int, noiseSeed: Long = -1L): Array[Float] = {
      val r = if (noiseSeed >= 0) new ClipCorpus.Rng(noiseSeed) else null
      Array.tabulate(n) { i =>
        val v = amp * math.sin(2.0 * math.Pi * freq * i / sr)
        val noise = if (r == null) 0.0 else (r.nextDouble() - 0.5) * amp * 0.02
        (v + noise).toFloat
      }
    }
    val n = sr / 2 // 500 ms
    val base = AudioPcm.encodeJvm(sine(440.0, 0.6, n))
    val near = AudioPcm.encodeJvm(sine(440.0, 0.6, n, noiseSeed = 7L))
    val far1 = AudioPcm.encodeJvm(sine(2600.0, 0.4, n))
    val far2 = AudioPcm.encodeJvm(sine(901.0, 0.8, n))
    val rows =
      (1 to 50).map(i => (f"copy_$i%03d", base, sr, 500, "pcm_s16le", "")) ++
        Seq(("near_dup", near, sr, 500, "pcm_s16le", ""),
          ("far_a", far1, sr, 500, "pcm_s16le", ""),
          ("far_b", far2, sr, 500, "pcm_s16le", ""))
    val clips = rows.toDF("clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript")
    val res = DedupPipeline.run(spark, clips, cfg)
    val assign = res.clusters.collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val groupComps = (1 to 50).map(i => assign(f"copy_$i%03d")).toSet
    assert(groupComps.size == 1, s"exact copies split: $groupComps")
    assert(assign.get("near_dup").contains(groupComps.head),
      "near-dup did not join the exact group's cluster via its representative")
    assert(!assign.get("far_a").exists(_ == groupComps.head) &&
      !assign.get("far_b").exists(_ == groupComps.head), "distractor leaked in")
    val nPairs = res.dupPairs.count()
    assert(nPairs <= 60, s"pair table quadratic in group size: $nPairs pairs " +
      "(expected ~50 star edges + 1 rep-level near-dup pair)")
  }

  test("containment tier: suffix-array backend reproduces the winnowing clusters") {
    // same corpus, tier (d) on the exact suffix-array pass — the final
    // cluster assignment must be IDENTICAL (winnowing has exact recall and
    // an exact verify, so the two backends emit the same containment pairs;
    // method attribution of pairs caught by several tiers is arbitrary under
    // dropDuplicates, so clusters — the real contract — are compared)
    val resSa = DedupPipeline.run(spark, ClipCorpus.clips(spark, cc).toDF(),
      cfg.copy(containmentViaSuffixArray = true))
    val base = result.clusters.select("node", "component").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val sa = resSa.clusters.select("node", "component").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(sa == base)
    val methods = resSa.dupPairs.groupBy("method").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(methods.getOrElse("containment", 0L) > 0, "containment pairs via SA")
  }
}
