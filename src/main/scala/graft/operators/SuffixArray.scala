package graft.operators

import graft.SparkUtil
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed generalized suffix array over a document/transcript column,
 * and the exact substring-duplicate pass built on it — the reference's
 * "shared verbatim substring >= minRun chars => duplicate" rule
 * (literal_similarity.py:1023,1039-1045) computed EXACTLY, with no
 * sampling: the suffix-array pass is the exact complement of the winnowing
 * screen in ContainmentJoin (winnowing = sampled fingerprints + verify;
 * this pass = complete suffix equality classes, zero false positives or
 * negatives by construction).
 *
 * Construction is Manber–Myers prefix doubling re-expressed as DataFrame
 * rounds (the standard distributed form — each round is one window `lead`
 * plus one global dense rank, all bounded shuffles over the position
 * relation):
 *
 *   rank_k[i]  = equivalence class of the first k chars of suffix i
 *   rank_2k[i] = dense rank of (rank_k[i], rank_k[i+k])   — O(log L) rounds
 *
 * Scale shape at 10^12 chars: every round shuffles the (id, pos, rank)
 * relation a bounded number of times (a `lead` window keyed by doc id, a
 * range-partitioned sort of the DISTINCT rank pairs, one join back) — all
 * linear in total corpus characters with no skew amplification (rank pairs
 * approach uniqueness after the first rounds; the range partitioner
 * balances by sampling). Rounds stop early as soon as every suffix class
 * is a singleton — on natural text that is depth ~32-64, not max document
 * length. This is the honest cost of an exact substring pass; the winnowing
 * screen stays the cheap default and this pass is the exact path for
 * long-transcript containment (north rule: "distributed suffix-array
 * substring pass for long-transcript containment dups").
 *
 * Positions count Unicode CODE POINTS, 0-based internally (exposed 1-based
 * by the oracle queries), matching Spark `substr`/`length` and DuckDB
 * `substr` semantics so every rank is reproducible in ANSI SQL.
 */
object SuffixArray {

  /** Initial ranking depth: round 0 ranks whole `InitK`-grams (one string
    * sort) instead of single characters, saving log2(InitK) doubling rounds.
    * String order == truncated-suffix order (a prefix sorts before its
    * extensions, like a sentinel smaller than every char), so the doubling
    * invariant holds from round 0. */
  val InitK = 16

  /** Global dense rank of a DISTINCT-key relation, scalably: range-partition
    * sort -> pin partitions (eager localCheckpoint) -> per-partition row
    * index from monotonically_increasing_id (partition id in the high 31
    * bits, row index in the low 33 — stable once the RDD is materialized)
    * -> broadcast-join the <= numPartitions cumulative offsets. No global
    * window, no single-task stage; the only driver-side data is one count
    * per shuffle partition (the same bounded-collect budget as the store's
    * bucket-id sets).
    *
    * Returns (ranked relation with `out` = 1-based dense rank, key count,
    * free-thunk releasing the pinned blocks). */
  private[graft] def rankDistinct(keys: DataFrame, sortCols: Seq[String], out: String)
      : (DataFrame, Long, () => Unit) = {
    val spark = keys.sparkSession
    import spark.implicits._
    val (sorted, free) = SparkUtil.checkpointCut(
      keys.repartitionByRange(sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*))
    val withId = sorted.withColumn("_mid", monotonically_increasing_id())
    val counts = withId
      .groupBy(shiftright(col("_mid"), 33).as("_pid")).agg(count(lit(1)).as("_c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val total = counts.map(_._2).sum
    val offsets = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _).dropRight(1)).toSeq
    val offDf = offsets.toDF("_pid", "_off")
    val ranked = withId
      .withColumn("_pid", shiftright(col("_mid"), 33))
      .join(broadcast(offDf), "_pid")
      .select(sortCols.map(col) :+
        (col("_off") + col("_mid").bitwiseAND(lit((1L << 33) - 1)) + 1).as(out): _*)
    (ranked, total, free)
  }

  /** All suffix grams: substr(text, i, k) for every 1-based code-point
    * position i — shorter at the tail, which string order ranks first
    * (prefix < extension), exactly sentinel-padded suffix order. */
  private def suffixGrams(text: org.apache.spark.sql.Column, k: Int) =
    transform(sequence(lit(1), length(text)), i => text.substr(i, lit(k)))

  /** (_id, _pos, _rank) where `_pos` is the 0-based code-point offset and
    * `_rank` is the dense rank of the suffix truncated at `depth` chars
    * (depth must be a power of two >= InitK is not required — it is clamped
    * from below by the initial gram round). Doubling stops early once all
    * classes are singletons — deeper ranks would equal these ranks.
    *
    * Returns (relation, free-thunk for its pinned blocks). */
  def suffixRanks(df: DataFrame, idCol: String, textCol: String, depth: Int)
      : (DataFrame, () => Unit) = {
    require(depth >= 1, "depth must be >= 1")
    val initK = math.min(InitK, Integer.highestOneBit(depth))
    val (init, freeInit) = SparkUtil.checkpointCut(
      df.filter(length(col(textCol)) >= 1)
        .select(col(idCol).as("_id"),
          posexplode(suffixGrams(col(textCol), initK)).as(Seq("_pos", "_g"))))
    val (r0, n0, freeR0) = rankDistinct(init.select("_g").distinct(), Seq("_g"), "_rank")
    var (cur, freeCur) = SparkUtil.checkpointCut(
      init.join(r0, "_g").select(col("_id"), col("_pos"), col("_rank")))
    freeInit(); freeR0()
    val nPos = cur.count()
    var k = initK
    var distinctKeys = n0
    while (k < depth && distinctKeys < nPos) {
      val w = Window.partitionBy(col("_id")).orderBy(col("_pos"))
      // rank 0 = "suffix ends before this window" sentinel, ranks are 1-based
      val paired = cur.withColumn("_r2",
        coalesce(lead(col("_rank"), k).over(w), lit(0L)))
      val (ranked, nKeys, freeRank) = rankDistinct(
        paired.select("_rank", "_r2").distinct(), Seq("_rank", "_r2"), "_nrank")
      val (nextCp, freeNext) = SparkUtil.checkpointCut(
        paired.join(ranked, Seq("_rank", "_r2"))
          .select(col("_id"), col("_pos"), col("_nrank").as("_rank")))
      freeRank(); freeCur()
      cur = nextCp; freeCur = freeNext
      distinctKeys = nKeys
      k *= 2
    }
    (cur, freeCur)
  }

  /** The generalized suffix array: (_id, _pos 0-based, sa_pos 1-based),
    * suffixes ordered by full content with (id, pos) breaking ties between
    * identical suffixes of different documents. */
  def suffixArray(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val maxLen = df.agg(max(length(col(textCol)))).head() match {
      case r if r.isNullAt(0) => 0
      case r => r.getInt(0)
    }
    if (maxLen == 0)
      return df.sparkSession.emptyDataFrame
        .withColumn("_id", lit(null)).withColumn("_pos", lit(0L))
        .withColumn("sa_pos", lit(0L)).limit(0)
    val (ranks, freeRanks) = suffixRanks(df, idCol, textCol,
      math.max(1, Integer.highestOneBit(maxLen) * 2))
    val (sa, _, freeSa) = rankDistinct(
      ranks.select(col("_rank"), col("_id"), col("_pos")),
      Seq("_rank", "_id", "_pos"), "sa_pos")
    val (cp, _) = SparkUtil.checkpointCut(sa.select(col("_id"), col("_pos"), col("sa_pos")))
    freeRanks(); freeSa()
    cp
  }

  /** EXACT substring-duplicate pairs: (a, b) with a < b iff the two
    * documents share a verbatim run of >= minRun code points. Classic
    * any-length-prefix comparison: with k = 2^floor(lg minRun) (so
    * k <= minRun <= 2k), suffixes i, j share a minRun-prefix iff
    * (rank_k[i], rank_k[i + minRun - k]) == (rank_k[j], rank_k[j + minRun - k])
    * — the two k-windows cover the minRun span. Grouping positions by that
    * class key and pairing distinct documents within each class yields
    * exactly the shared-run pairs. `maxClass` drops classes shared by more
    * documents than the skew cap (ubiquitous boilerplate runs — same guard
    * and rationale as DedupConfig.containmentMaxBucket); Int.MaxValue =
    * exact. */
  def substringPairs(df: DataFrame, idCol: String, textCol: String, minRun: Int,
                     maxClass: Int = Int.MaxValue): DataFrame = {
    require(minRun >= 2, "minRun must be >= 2")
    val k = Integer.highestOneBit(minRun)
    val (ranks, freeRanks) = suffixRanks(df, idCol, textCol, k)
    val w = Window.partitionBy(col("_id")).orderBy(col("_pos"))
    val shifted = if (minRun == k) col("_rank") else lead(col("_rank"), minRun - k).over(w)
    val (cls, freeCls) = SparkUtil.checkpointCut(
      ranks
        .withColumn("_c2", shifted)
        .withColumn("_n", count(lit(1)).over(Window.partitionBy(col("_id"))))
        // keep only positions with a full minRun window (0-based:
        // pos + minRun <= doc length); there the lead target exists
        .filter(col("_pos") <= col("_n") - minRun)
        .select(col("_id"), col("_rank").as("_c1"), col("_c2"))
        .distinct())
    freeRanks()
    val sizes = cls.groupBy("_c1", "_c2").agg(count(lit(1)).as("_n"))
    val kept = cls.join(sizes.filter(col("_n") <= maxClass), Seq("_c1", "_c2"))
    val (cp, _) = SparkUtil.checkpointCut(
      kept.select(col("_c1"), col("_c2"), col("_id").as("a"))
        .join(kept.select(col("_c1"), col("_c2"), col("_id").as("b")), Seq("_c1", "_c2"))
        .filter(col("a") < col("b"))
        .select("a", "b").distinct())
    freeCls()
    cp
  }
}
