package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Config for cross-method score fusion in search (the analog of the
  * reference's per-model weight dict + method selector,
  * weighted_models_demo.py:395-502). `method` picks which fused column ranks
  * results: "weighted_fusion" or "adaptive_fusion". Methods absent from
  * `weights` contribute neither score nor weight to weighted_fusion (the
  * reference's `if method in weights` guard) — include every method that
  * should count, e.g. "exact" for identity matches in clip search. */
final case class FusionConfig(
    weights: Map[String, Double],
    method: String = "weighted_fusion",
    threshold: Double = 0.0)

/**
 * Weighted + adaptive score fusion over per-method similarity scores —
 * re-expressing the reference's `calculate_comprehensive_similarity` fusion
 * tail (weighted_models_demo.py:395-455) as one declarative aggregation:
 *
 *  - weighted_fusion = sum(w_m * s_m) / sum(w_m) over methods with s_m > 0
 *    (absent/zero methods contribute neither score nor weight — the
 *    reference's `if method in weights and sim > 0` guard);
 *  - adaptive_fusion: per pair, each valid method's weight is
 *    0.1 + mean(|s_m - s_other|) over the other valid methods (discriminative
 *    methods weigh more), normalized to sum 1, then sum(w_m * s_m)
 *    (`_calculate_adaptive_weights`, :423-455).
 *
 * Plan shape: one groupBy per (probe, match) pair gathering the <= #methods
 * per-method scores into a bounded array, then higher-order array functions
 * (transform/aggregate) compute both fusions without a UDF or a second
 * shuffle. Group width is bounded by the method count (4 here), so the
 * collected array can never blow an aggregation buffer.
 */
object Fusion {

  /**
   * @param scores  (keyCols..., method, score) one row per scored method
   * @param keyCols pair identity, e.g. (probe_id, match_id)
   * @param weights method -> weight for weighted_fusion
   * @return keyCols + (weighted_fusion, adaptive_fusion, n_methods)
   */
  def fuse(scores: DataFrame, keyCols: Seq[String],
           weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty, "fusion weights must not be empty")
    val ws = weights.toSeq
    val wExpr = ws.tail.foldLeft(when(col("method") === ws.head._1, ws.head._2)) {
      case (acc, (m, w)) => acc.when(col("method") === m, w)
    }.otherwise(lit(0.0))

    val perPair = scores.filter(col("score") > 0)
      .groupBy(keyCols.map(col): _*)
      .agg(collect_list(struct(col("score").as("s"), wExpr.as("w"))).as("ms"))

    val n = size(col("ms"))
    def fsum(arr: Column, f: Column => Column): Column =
      aggregate(arr, lit(0.0), (acc, x) => acc + f(x))
    val wNum = fsum(col("ms"), x => x("s") * x("w"))
    val wDen = fsum(col("ms"), x => x("w"))

    // adaptive weights: 0.1 + mean |s_i - s_j| over OTHER methods; with one
    // method the mean is 0 (reference: empty diff list -> avg 0)
    val araw = transform(col("ms"), x => struct(
      x("s").as("s"),
      (lit(0.1) + when(n > 1,
        aggregate(col("ms"), lit(0.0), (a, y) => a + abs(y("s") - x("s")))
          / (n - 1).cast("double")).otherwise(lit(0.0))).as("w")))
    val aDen = fsum(araw, x => x("w"))
    val aNum = fsum(araw, x => x("s") * x("w"))

    perPair.select(keyCols.map(col) ++ Seq(
      when(wDen > 0, wNum / wDen).otherwise(lit(0.0)).as("weighted_fusion"),
      when(aDen > 0, aNum / aDen).otherwise(lit(0.0)).as("adaptive_fusion"),
      n.cast("int").as("n_methods")): _*)
  }
}
