package graft.operators

import graft.config.DedupConfig
import graft.functions.SimHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Exact verification of LSH candidate pairs — the analog of the reference's
 * implicit exactness (its flat FAISS index is exact cosine,
 * improved_faiss_detector.py:297-317): every candidate is re-scored with the
 * TRUE metric so LSH false positives cannot reach the dup_pairs table.
 *
 * Metrics per pair:
 *  - exact Jaccard over shingle sets: |A∩B| / |A∪B|
 *    (utils/distance.py:129-134 `jaccard_coef`)
 *  - SimHash hamming similarity (screen; tests pin near-dup > 0.5,
 *    tests/test_literalsim.py:76)
 */
object PairVerifier {

  /**
   * @param pairs      (a, b) candidate pairs
   * @param features   (id, shingles: array, simhash: long) per row
   * @param jaccardThreshold keep pairs with exact jaccard >= threshold
   * @param method     provenance tag written into the result
   * @return (a, b, score, method) verified dup pairs, score = exact jaccard
   */
  def verify(pairs: DataFrame, features: DataFrame, idCol: String,
             shinglesCol: String, jaccardThreshold: Double,
             method: String): DataFrame = {
    val fa = features.select(col(idCol).as("a"), col(shinglesCol).as("_sa"))
    val fb = features.select(col(idCol).as("b"), col(shinglesCol).as("_sb"))
    pairs.join(fa, "a").join(fb, "b")
      .withColumn("score",
        size(array_intersect(col("_sa"), col("_sb"))).cast("double") /
          size(array_union(col("_sa"), col("_sb"))))
      .filter(col("score") >= jaccardThreshold)
      .select(col("a"), col("b"), col("score"), lit(method).as("method"))
  }

  /** SimHash hamming screen over candidate pairs. */
  def simhashScreen(pairs: DataFrame, features: DataFrame, idCol: String,
                    simhashCol: String, cfg: DedupConfig): DataFrame = {
    val fa = features.select(col(idCol).as("a"), col(simhashCol).as("_ha"))
    val fb = features.select(col(idCol).as("b"), col(simhashCol).as("_hb"))
    pairs.join(fa, "a").join(fb, "b")
      .withColumn("simhashSim", SimHash.hammingSim(col("_ha"), col("_hb")))
      .select(col("a"), col("b"), col("simhashSim"))
  }

  /** Zero-lag normalized cross-correlation of two decoded PCM signals,
    * truncated to the shorter length. The TRUE audio-dup metric (additive
    * noise at 35 dB SNR gives corr ~0.9997; unrelated signals ~0). */
  def pcmCorrJvm(a: Array[Byte], b: Array[Byte]): Double = {
    if (a == null || b == null || a.length < 4 || b.length < 4) return 0.0
    val xa = graft.functions.AudioPcm.decodeJvm(a)
    val xb = graft.functions.AudioPcm.decodeJvm(b)
    val n = math.min(xa.length, xb.length)
    var sab = 0.0; var saa = 0.0; var sbb = 0.0
    var i = 0
    while (i < n) {
      sab += xa(i).toDouble * xb(i); saa += xa(i).toDouble * xa(i)
      sbb += xb(i).toDouble * xb(i); i += 1
    }
    if (saa == 0.0 || sbb == 0.0) 0.0 else sab / math.sqrt(saa * sbb)
  }

  /**
   * Exact audio confirm over candidate pairs: join decoded bytes back and
   * keep pairs with PCM correlation >= minCorr and compatible geometry
   * (same sample rate, length ratio >= 0.9). Runs only on pairs that already
   * passed the jaccard floor, so the byte shuffle is O(dup pairs), not
   * O(corpus).
   */
  def pcmConfirm(pairs: DataFrame, clips: DataFrame, idCol: String,
                 minCorr: Double): DataFrame = {
    val corrUdf = udf((x: Array[Byte], y: Array[Byte]) => pcmCorrJvm(x, y))
    val ca = clips.select(col(idCol).as("a"), col("bytes").as("_ba"), col("sr_hz").as("_sra"))
    val cb = clips.select(col(idCol).as("b"), col("bytes").as("_bb"), col("sr_hz").as("_srb"))
    pairs.join(ca, "a").join(cb, "b")
      .filter(col("_sra") === col("_srb"))
      .filter(least(length(col("_ba")), length(col("_bb"))).cast("double") /
        greatest(length(col("_ba")), length(col("_bb"))) >= 0.9)
      .withColumn("pcmCorr", corrUdf(col("_ba"), col("_bb")))
      .filter(col("pcmCorr") >= minCorr)
      .select(pairs.columns.map(col): _*)
  }

  /**
   * Global pair cap with rising score floor, the reference's max_pairs
   * semantics (utils/util.py:174-220). NEVER silent: returns the kept pairs
   * plus the number dropped, which the pipeline writes to metrics.
   */
  def capPairs(pairs: DataFrame, maxPairs: Long): (DataFrame, Long) = {
    val n = pairs.count()
    if (n <= maxPairs) (pairs, 0L)
    else (pairs.orderBy(desc("score"), col("a"), col("b")).limit(maxPairs.toInt), n - maxPairs)
  }
}
