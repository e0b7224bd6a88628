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
  /** Exact Jaccard of two long arrays via sorted-merge — one O(n) primitive
    * pass. `array_intersect`+`array_union` cost ~tens of ms per 1k-element
    * pair (boxed hash sets, built twice); at 10^5..10^9 candidate pairs the
    * verify stage lives or dies on this kernel. Inputs are sorted by the
    * shingle producers; sorts defensively if not (cheap vs the join). */
  def jaccardLongJvm(a: Array[Long], b: Array[Long]): Double = {
    if (a == null || b == null || a.isEmpty || b.isEmpty) return 0.0
    def ensureSorted(x: Array[Long]): Array[Long] = {
      var i = 1
      while (i < x.length && x(i - 1) <= x(i)) i += 1
      if (i == x.length) x
      else { val c = x.clone(); java.util.Arrays.sort(c); c }
    }
    val sa = ensureSorted(a); val sb = ensureSorted(b)
    var i = 0; var j = 0; var inter = 0
    while (i < sa.length && j < sb.length) {
      if (sa(i) == sb(j)) { inter += 1; i += 1; j += 1 }
      else if (sa(i) < sb(j)) i += 1
      else j += 1
    }
    inter.toDouble / (sa.length + sb.length - inter)
  }

  /** MinHash agreement fraction of two equal-length signatures — the
    * unbiased Jaccard estimate, one primitive pass. */
  def estimateJvm(a: Array[Long], b: Array[Long]): Double = {
    if (a == null || b == null || a.length == 0 || a.length != b.length) return 0.0
    var i = 0; var eq = 0
    while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / a.length
  }

  /**
   * Signature-estimate prefilter: re-score candidate pairs with the MinHash
   * ESTIMATE (joins the P-long signature, ~8P bytes/row) and keep pairs with
   * estimate >= estMin, so the exact-Jaccard stage only shuffles the much
   * larger shingle arrays for plausible pairs. estMin should sit >= 3 sigma
   * (sigma ~ sqrt(t(1-t)/P)) below the verify threshold t so no true pair is
   * lost.
   */
  /** Features restricted to rows that appear as a candidate-pair endpoint —
    * a left_semi prefilter (NO broadcast hint: the endpoint set is unbounded
    * at 10^12-row scale; AQE broadcasts when it is actually small). Pairs are
    * few relative to the corpus, so the downstream feature shuffles become
    * O(|pairs|) instead of O(|corpus|). */
  private def endpointFeatures(pairs: DataFrame, features: DataFrame,
                               idCol: String): DataFrame = {
    val ids = pairs.select(col("a").as(idCol))
      .union(pairs.select(col("b").as(idCol))).distinct()
    features.join(ids, Seq(idCol), "left_semi")
  }

  def estimateScreen(pairs: DataFrame, features: DataFrame, idCol: String,
                     sigCol: String, estMin: Double): DataFrame = {
    val est = udf((x: Array[Long], y: Array[Long]) => estimateJvm(x, y))
    val needed = endpointFeatures(pairs, features.select(col(idCol), col(sigCol)), idCol)
    val fa = needed.select(col(idCol).as("a"), col(sigCol).as("_ea"))
    val fb = needed.select(col(idCol).as("b"), col(sigCol).as("_eb"))
    pairs.join(fa, "a").join(fb, "b")
      .filter(est(col("_ea"), col("_eb")) >= estMin)
      .select(pairs.columns.map(col): _*)
  }

  def verify(pairs: DataFrame, features: DataFrame, idCol: String,
             shinglesCol: String, jaccardThreshold: Double,
             method: String): DataFrame = {
    val jac = udf((x: Array[Long], y: Array[Long]) => jaccardLongJvm(x, y))
    val needed = endpointFeatures(pairs, features.select(col(idCol), col(shinglesCol)), idCol)
    val fa = needed.select(col(idCol).as("a"), col(shinglesCol).as("_sa"))
    val fb = needed.select(col(idCol).as("b"), col(shinglesCol).as("_sb"))
    pairs.join(fa, "a").join(fb, "b")
      .withColumn("score", jac(col("_sa"), col("_sb")))
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
    * noise at 35 dB SNR gives corr ~0.9997; unrelated signals ~0).
    *
    * Computed directly in the int16 domain, ZERO allocation: the decode
    * scale 1/32768 is a power of two, so every product and partial sum of
    * the decoded-float formulation is exactly 2^30 times the int16 one —
    * power-of-two scaling is exact in binary floating point, hence the
    * ratio is BIT-IDENTICAL to decoding first (pinned by OperatorSpec
    * parity test). The decoded-float form allocated two fresh float arrays
    * (~100+ KB) per candidate PAIR — measured as the dominant GC source of
    * the whole dup-pair stage (9-17 s of GC at 100k clips). */
  def pcmCorrJvm(a: Array[Byte], b: Array[Byte]): Double = {
    if (a == null || b == null || a.length < 4 || b.length < 4) return 0.0
    val n = math.min(a.length, b.length) / 2
    var sab = 0.0; var saa = 0.0; var sbb = 0.0
    var i = 0
    while (i < n) {
      val sa = (a(2 * i + 1) << 8) | (a(2 * i) & 0xff)
      val sb = (b(2 * i + 1) << 8) | (b(2 * i) & 0xff)
      sab += sa.toDouble * sb; saa += sa.toDouble * sa
      sbb += sb.toDouble * sb; i += 1
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
    // Shrink the byte-heavy clip table to only the ids that appear in a
    // candidate pair BEFORE the pair joins: the difference between shuffling
    // O(|pairs|) bytes and O(|corpus|) bytes, twice. left_semi WITHOUT a
    // forced broadcast — the pair-endpoint set is unbounded (billions of rows
    // at 10^12-clip scale would OOM the driver); AQE picks broadcast when the
    // set is actually small.
    val ids = pairs.select(col("a").as(idCol)).union(pairs.select(col("b").as(idCol))).distinct()
    val needed = clips.join(ids, Seq(idCol), "left_semi")
    val ca = needed.select(col(idCol).as("a"), col("bytes").as("_ba"), col("sr_hz").as("_sra"))
    val cb = needed.select(col(idCol).as("b"), col("bytes").as("_bb"), col("sr_hz").as("_srb"))
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
    else {
      // limit() takes an Int; clamp instead of silently wrapping for caps
      // configured above 2^31 (the count() above reports the true drop).
      val keep = math.min(maxPairs, Int.MaxValue.toLong).toInt
      (pairs.orderBy(desc("score"), col("a"), col("b")).limit(keep), n - keep)
    }
  }
}
