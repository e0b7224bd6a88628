package graft.operators

import graft.config.DedupConfig
import graft.functions.{Hashing, TextShingles}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Containment-duplicate pass: pairs of documents sharing a verbatim substring
 * of length >= cfg.containmentMinRun — the reference's SequenceMatcher rule
 * (literal_similarity.py:1023,1039-1045: shared substring > 70 chars => sim
 * 0.9) and the intent of its crop-resistant region hash
 * (utils/imagehash.py:350-595), re-expressed for 10^12-row scale.
 *
 * Candidate generation is winnowing (the MOSS fingerprinting scheme, Schleimer
 * et al., SIGMOD'03): hash every k-gram, then per document select the minimum
 * hash of every window of w = minRun - k + 1 consecutive k-grams. Selection is
 * by VALUE, so it is alignment-free: any shared run of >= w + k - 1 = minRun
 * chars contains a full common window in both documents, whose minimum is
 * selected on both sides => the pair shares a fingerprint. A shared-fingerprint
 * bucket self-join (with the same oversize guard as LSH) yields candidates;
 * an exact longest-common-run check confirms (no false positives survive).
 *
 * Plan shape: explode k-gram offsets -> window min per doc (one shuffle on
 * doc id) -> distinct (doc, fingerprint) -> bucket self-join -> pair-local
 * exact verify. Everything but the O(len) per-row gram explosion is linear.
 */
object ContainmentJoin {
  val GramK = 16

  /** (id, fp) distinct winnowing fingerprints per document. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
                   minRun: Int, portable: Boolean = false): DataFrame = {
    val w = minRun - GramK + 1
    require(w >= 1, s"minRun must be >= $GramK")
    val hashFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      if (portable) Hashing.md5Hash60 else xxhash64(_)
    val grams = df
      .filter(length(col(textCol)) >= minRun)
      .select(col(idCol), posexplode(
        TextShingles.charGrams(col(textCol), GramK)).as(Seq("off", "gram")))
      .select(col(idCol), col("off"), hashFn(col("gram")).as("gh"))
    val win = Window.partitionBy(col(idCol)).orderBy(col("off"))
      .rowsBetween(0, w - 1)
    grams
      .withColumn("nGrams", count(lit(1)).over(Window.partitionBy(col(idCol))))
      .withColumn("fp", min(col("gh")).over(win))
      // only full windows select fingerprints (tail windows are covered by
      // earlier starts; a doc passing the length filter has >= w grams)
      .filter(col("off") <= col("nGrams") - w)
      .select(col(idCol), col("fp")).distinct()
  }

  /** Row-local longest common substring length (rolling-array DP). */
  def longestCommonRunJvm(a: String, b: String): Int = {
    if (a == null || b == null || a.isEmpty || b.isEmpty) return 0
    val (s, t) = if (a.length <= b.length) (a, b) else (b, a)
    val prev = new Array[Int](s.length + 1)
    val cur = new Array[Int](s.length + 1)
    var best = 0
    var j = 0
    while (j < t.length) {
      var i = 0
      while (i < s.length) {
        cur(i + 1) = if (t.charAt(j) == s.charAt(i)) prev(i) + 1 else 0
        if (cur(i + 1) > best) best = cur(i + 1)
        i += 1
      }
      System.arraycopy(cur, 0, prev, 0, cur.length)
      j += 1
    }
    best
  }

  /** Verified containment pairs (a < b, shared run >= cfg.containmentMinRun). */
  def pairs(df: DataFrame, idCol: String, textCol: String, cfg: DedupConfig): DataFrame = {
    val spark = df.sparkSession
    val fps = fingerprints(df, idCol, textCol, cfg.containmentMinRun)
    val sizes = fps.groupBy("fp").agg(count(lit(1)).as("n"))
    val kept = fps.join(sizes.filter(col("n") <= cfg.maxBucketSize), "fp")
    val cands = kept.select(col("fp"), col(idCol).as("a"))
      .join(kept.select(col("fp"), col(idCol).as("b")), "fp")
      .filter(col("a") < col("b"))
      .select("a", "b").dropDuplicates("a", "b")
    val txt = df.select(col(idCol), col(textCol))
    val lcrUdf = udf((x: String, y: String) => longestCommonRunJvm(x, y))
    cands
      .join(txt.select(col(idCol).as("a"), col(textCol).as("_ta")), "a")
      .join(txt.select(col(idCol).as("b"), col(textCol).as("_tb")), "b")
      .filter(lcrUdf(col("_ta"), col("_tb")) >= cfg.containmentMinRun)
      .select("a", "b")
  }
}
