package graft

import graft.operators.Fusion
import org.apache.spark.sql.functions._

/**
 * Cross-method score fusion (weighted_models_demo.py:395-502): weighted
 * fusion normalizes by the weights of PRESENT methods only, adaptive fusion
 * rewards discriminative methods (0.1 + mean |s - s_other|, normalized), and
 * changing the weight dict reorders results — the reference demo's
 * documented behavior.
 */
class FusionSpec extends SparkSpec {
  import spark.implicits._

  private val W = Map("text_minhash" -> 0.5, "audio_minhash" -> 0.3,
    "containment" -> 0.2)

  test("weighted_fusion matches the hand-computed reference formula") {
    val scores = Seq(
      ("p", "m1", "text_minhash", 0.9), ("p", "m1", "audio_minhash", 0.6),
      ("p", "m2", "text_minhash", 0.8)) // containment absent for both
      .toDF("probe_id", "match_id", "method", "score")
    val f = Fusion.fuse(scores, Seq("probe_id", "match_id"), W)
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    // m1: (0.5*0.9 + 0.3*0.6) / (0.5 + 0.3); m2: 0.8 (only method present)
    assert(math.abs(f("m1") - (0.5 * 0.9 + 0.3 * 0.6) / 0.8) < 1e-12)
    assert(math.abs(f("m2") - 0.8) < 1e-12)
  }

  test("adaptive_fusion rewards the discriminative method and normalizes") {
    val scores = Seq(
      ("p", "m", "text_minhash", 0.9), ("p", "m", "audio_minhash", 0.5),
      ("p", "m", "containment", 0.4))
      .toDF("probe_id", "match_id", "method", "score")
    val row = Fusion.fuse(scores, Seq("probe_id", "match_id"), W).head()
    val adaptive = row.getDouble(row.fieldIndex("adaptive_fusion"))
    // reference math: w_raw(s) = 0.1 + mean(|s - other|)
    val ss = Seq(0.9, 0.5, 0.4)
    val raw = ss.map(s => 0.1 + ss.filter(_ != s).map(o => math.abs(s - o)).sum / 2)
    val norm = raw.map(_ / raw.sum)
    val expect = ss.zip(norm).map { case (s, w) => s * w }.sum
    assert(math.abs(adaptive - expect) < 1e-12, s"$adaptive vs $expect")
    // single-method pair: weight 0.1 normalizes to 1 -> score passes through
    val one = Fusion.fuse(Seq(("p", "x", "text_minhash", 0.7))
        .toDF("probe_id", "match_id", "method", "score"),
      Seq("probe_id", "match_id"), W).head()
    assert(math.abs(one.getDouble(one.fieldIndex("adaptive_fusion")) - 0.7) < 1e-12)
  }

  test("changing fusion weights reorders matches") {
    // m1 is text-strong, m2 is audio-strong: a text-heavy weight dict ranks
    // m1 first, an audio-heavy one ranks m2 first
    val scores = Seq(
      ("p", "m1", "text_minhash", 0.9), ("p", "m1", "audio_minhash", 0.4),
      ("p", "m2", "text_minhash", 0.4), ("p", "m2", "audio_minhash", 0.9))
      .toDF("probe_id", "match_id", "method", "score")
    def top(w: Map[String, Double]): String =
      Fusion.fuse(scores, Seq("probe_id", "match_id"), w)
        .orderBy(col("weighted_fusion").desc).head().getString(1)
    assert(top(Map("text_minhash" -> 0.8, "audio_minhash" -> 0.2)) == "m1")
    assert(top(Map("text_minhash" -> 0.2, "audio_minhash" -> 0.8)) == "m2")
  }
}
