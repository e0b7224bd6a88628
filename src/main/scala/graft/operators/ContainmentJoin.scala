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
  // Gram size trades fingerprint selectivity against the window span
  // (w = minRun - k + 1 must stay >= 1). k=16 let chance-shared short word
  // sequences across UNRELATED docs collide into shared fingerprints:
  // measured 4.6M candidate pairs at 200k docs (3.5x per 2x docs — a
  // quadratic in-bucket term that is O(n^2) at 10^12 rows), of which 99.4%
  // died in the gram prefilter. k=24 (a ~4-word verbatim phrase) cuts that
  // to 67k candidates (69x) with the prefilter-survivor count unchanged —
  // the winnowing guarantee (any shared run >= minRun yields a shared
  // fingerprint) holds for any k <= minRun, property-tested in OperatorSpec.
  val GramK = 24

  /** (id, fp) distinct winnowing fingerprints per document.
    *
    * The portable (md5-60) form runs the row-local kernel below: the
    * declarative explode+window plan shuffles and sorts one row PER CHARACTER
    * of every document through two window functions — measured as nearly all
    * of q_containment_fp's 5.8 s at sf0.1 — where the kernel is one deque
    * pass per row with NO shuffle. Output equality with the declarative plan
    * (and therefore with the DuckDB oracle text, which mirrors it) is pinned
    * by OperatorSpec's kernel==plan parity test incl. non-BMP code points. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
                   minRun: Int, portable: Boolean = false): DataFrame = {
    require(minRun - GramK + 1 >= 1, s"minRun must be >= $GramK")
    if (portable)
      df.select(col(idCol),
        explode(portableFingerprintsUdf(minRun)(col(textCol))).as("fp"))
    else fingerprintsDeclarative(df, idCol, textCol, minRun, portable = false)
  }

  /** The declarative explode+window plan (kept as the parity-test reference
    * and the shape the oracle SQL mirrors; see `fingerprints`). */
  private[graft] def fingerprintsDeclarative(
      df: DataFrame, idCol: String, textCol: String,
      minRun: Int, portable: Boolean): DataFrame = {
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

  /** Portable winnowing kernel — bit-identical to the declarative plan:
    * length/gram positions count CODE POINTS (Spark `substr`/`length` and
    * DuckDB `substr` both do), gram hash = first 60 bits of md5(utf8(gram)),
    * minima of FULL w-windows only, per-doc distinct output. */
  def portableFingerprintsJvm(text: String, minRun: Int): Array[Long] = {
    val k = GramK
    val w = minRun - k + 1
    if (text == null) return Array.empty
    val cps = text.codePoints().toArray
    val n = cps.length - k + 1
    if (cps.length < minRun) return Array.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val gh = new Array[Long](n)
    var i = 0
    while (i < n) {
      // digest() resets the instance; one md5 per gram, no per-gram getInstance
      val d = md.digest(new String(cps, i, k)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var v = 0L
      var j = 0
      while (j < 7) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      gh(i) = (v << 4) | ((d(7) & 0xf0L) >> 4)
      i += 1
    }
    slidingMinDistinct(gh, n, w)
  }

  /** Column UDF form of portableFingerprintsJvm (array<long> per row). */
  def portableFingerprintsUdf(minRun: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((t: String) => portableFingerprintsJvm(t, minRun))

  /**
   * Row-local winnowing fingerprints — the fast path: identical semantics to
   * `fingerprints` (same gram hash when portable=false is NOT guaranteed —
   * this path uses a seeded 64-bit polynomial gram hash instead of
   * xxhash64/md5), computed in one pass with a monotonic deque (sliding
   * window minimum in O(n)), no explode, no window shuffle. Selection is by
   * value within each window, so the winnowing guarantee (any shared run of
   * >= minRun chars yields a shared fingerprint) holds identically.
   */
  def fingerprintsJvm(text: String, minRun: Int): Array[Long] = {
    val k = GramK
    val w = minRun - k + 1
    if (text == null || text.length < minRun) return Array.empty
    val n = text.length - k + 1 // number of grams
    // rolling 64-bit polynomial hash of each k-gram
    val B = 0x100000001b3L
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= B; i += 1 }
    val gh = new Array[Long](n)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + text.charAt(i); i += 1 }
    gh(0) = mix64(h)
    i = 1
    while (i < n) {
      h = (h - text.charAt(i - 1) * pow) * B + text.charAt(i + k - 1)
      gh(i) = mix64(h)
      i += 1
    }
    slidingMinDistinct(gh, n, w)
  }

  /** Sorted-distinct minima of every full w-window of gh[0..n) — monotonic
    * deque (O(n)), primitive buffer + sort-dedup, not a boxing HashSet. */
  private def slidingMinDistinct(gh: Array[Long], n: Int, w: Int): Array[Long] = {
    val nWin = n - w + 1
    val buf = new Array[Long](math.max(0, nWin))
    var nOut = 0
    val deque = new Array[Int](n)
    var head = 0; var tail = 0 // [head, tail)
    var i = 0
    while (i < n) {
      while (tail > head && gh(deque(tail - 1)) >= gh(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) { buf(nOut) = gh(deque(head)); nOut += 1 }
      i += 1
    }
    graft.functions.AudioPcm.sortedDistinct(buf, nOut)
  }

  private def mix64(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Column UDF form of fingerprintsJvm (array<long> per row). */
  def fingerprintsUdf(minRun: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((t: String) => fingerprintsJvm(t, minRun))

  /** (id, fp) fingerprints via the row-local fast path. */
  def fingerprintsFast(df: DataFrame, idCol: String, textCol: String, minRun: Int): DataFrame =
    df.select(col(idCol), explode(fingerprintsUdf(minRun)(col(textCol))).as("fp"))

  /** Row-local longest common substring length (rolling-array DP; the two
    * row buffers SWAP instead of copying — the arraycopy was O(|s|) extra
    * per outer row). */
  def longestCommonRunJvm(a: String, b: String): Int = {
    if (a == null || b == null || a.isEmpty || b.isEmpty) return 0
    val (s, t) = if (a.length <= b.length) (a, b) else (b, a)
    var prev = new Array[Int](s.length + 1)
    var cur = new Array[Int](s.length + 1)
    var best = 0
    var j = 0
    while (j < t.length) {
      val tj = t.charAt(j)
      var i = 0
      while (i < s.length) {
        cur(i + 1) = if (tj == s.charAt(i)) prev(i) + 1 else 0
        if (cur(i + 1) > best) best = cur(i + 1)
        i += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      j += 1
    }
    best
  }

  /** All k-gram hashes of `text`, sorted WITH multiplicity (same rolling hash
    * as the fingerprints) — the cheap necessary condition for a shared run: a
    * run of >= minRun chars contributes w = minRun-k+1 gram occurrences to
    * BOTH docs, so sum over values of min(multA, multB) >= w. Multiplicity
    * matters: a repetitive run (period < w, e.g. repeated boilerplate
    * padding) has far fewer than w DISTINCT grams, so a distinct-set count
    * would wrongly reject genuine containment on low-entropy text. */
  def gramHashesJvm(text: String): Array[Long] = {
    val k = GramK
    if (text == null || text.length < k) return Array.empty
    val n = text.length - k + 1
    val B = 0x100000001b3L
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= B; i += 1 }
    val buf = new Array[Long](n)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + text.charAt(i); i += 1 }
    buf(0) = mix64(h)
    i = 1
    while (i < n) {
      h = (h - text.charAt(i - 1) * pow) * B + text.charAt(i + k - 1)
      buf(i) = mix64(h)
      i += 1
    }
    java.util.Arrays.sort(buf)
    buf
  }

  /** 31-bit variant of gramHashesJvm (sorted, with multiplicity): HALF the
    * bytes through the prefilter join, which is the containment stage's
    * dominant cost (the candidate join hauls both sides' gram arrays for
    * every candidate pair). A 31-bit collision only INFLATES the multiset
    * intersection, so the prefilter stays a sound necessary condition. */
  def gramHashes31Jvm(text: String): Array[Int] = {
    val k = GramK
    if (text == null || text.length < k) return Array.empty
    val n = text.length - k + 1
    val B = 0x100000001b3L
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= B; i += 1 }
    val buf = new Array[Int](n)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + text.charAt(i); i += 1 }
    buf(0) = java.lang.Math.floorMod(mix64(h), Hashing.P).toInt
    i = 1
    while (i < n) {
      h = (h - text.charAt(i - 1) * pow) * B + text.charAt(i + k - 1)
      buf(i) = java.lang.Math.floorMod(mix64(h), Hashing.P).toInt
      i += 1
    }
    java.util.Arrays.sort(buf)
    buf
  }

  /** Multiset intersection size of two sorted int arrays (merge pass). */
  def sharedSorted31Jvm(a: Array[Int], b: Array[Int]): Int = {
    if (a == null || b == null) return 0
    var i = 0; var j = 0; var c = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { c += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    c
  }

  /** UDFs shared by the batch and incremental verify paths. */
  val gramsUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((t: String) => gramHashesJvm(t))
  val sharedUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((x: Array[Long], y: Array[Long]) => sharedSortedJvm(x, y))
  val grams31Udf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((t: String) => gramHashes31Jvm(t))
  val shared31Udf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((x: Array[Int], y: Array[Int]) => sharedSorted31Jvm(x, y))
  val lcrUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((x: String, y: String) => longestCommonRunJvm(x, y))

  /** Multiset intersection size of two sorted long arrays (merge pass):
    * sum over values of min(multiplicity in a, multiplicity in b). */
  def sharedSortedJvm(a: Array[Long], b: Array[Long]): Int = {
    if (a == null || b == null) return 0
    var i = 0; var j = 0; var c = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { c += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    c
  }

  /** Verified containment pairs (a < b, shared run >= cfg.containmentMinRun).
    *
    * Three-tier verify: shared-fingerprint candidates -> shared-gram-count
    * prefilter (a true >= minRun run REQUIRES multiset gram intersection
    * >= w — counted WITH multiplicity so repetitive/low-entropy runs are not
    * rejected; near-miss boilerplate prefixes shorter than minRun fail here
    * without ever running the DP) -> exact longest-common-run DP on
    * survivors only.
    */
  def pairs(df: DataFrame, idCol: String, textCol: String, cfg: DedupConfig): DataFrame =
    pairsFromFps(fingerprintsFast(df, idCol, textCol, cfg.containmentMinRun),
      df.select(col(idCol), col(textCol)), idCol, textCol, cfg)

  /** Same, from a precomputed (id, fp) relation (e.g. the signature table's
    * stored fingerprints — the incremental path never re-shingles). */
  def pairsFromFps(fps: DataFrame, df: DataFrame, idCol: String, textCol: String,
                   cfg: DedupConfig): DataFrame = {
    val w = cfg.containmentMinRun - GramK + 1
    val sizes = fps.groupBy("fp").agg(count(lit(1)).as("n"))
    // containmentMaxBucket (64), NOT the generic LSH cap (2000): a
    // fingerprint shared by dozens of docs is sub-minRun boilerplate whose
    // within-bucket pairing is quadratic (one 2000-doc bucket alone emits 2M
    // candidates that die in the prefilter); the incremental path
    // (IncrementalDedup) applies the same cap — batch and merge must agree.
    val kept = fps.join(sizes.filter(col("n") <= cfg.containmentMaxBucket), "fp")
    val cands = kept.select(col("fp"), col(idCol).as("a"))
      .join(kept.select(col("fp"), col(idCol).as("b")), "fp")
      .filter(col("a") < col("b"))
      .select("a", "b").dropDuplicates("a", "b")
    // two-stage verify: the gram-prefilter join carries ONLY the 4-byte gram
    // arrays (candidates x arrays is the stage's dominant byte volume —
    // measured 1.3M candidates x ~6 KB at 100k clips); texts join only for
    // the few prefilter survivors that reach the exact LCS DP.
    val gInt = df.select(col(idCol), grams31Udf(col(textCol)).as("_g"))
    val pre = cands
      .join(gInt.select(col(idCol).as("a"), col("_g").as("_ga")), "a")
      .join(gInt.select(col(idCol).as("b"), col("_g").as("_gb")), "b")
      .filter(shared31Udf(col("_ga"), col("_gb")) >= w)
      .select("a", "b")
    val txt = df.select(col(idCol), col(textCol))
    pre
      .join(txt.select(col(idCol).as("a"), col(textCol).as("_ta")), "a")
      .join(txt.select(col(idCol).as("b"), col(textCol).as("_tb")), "b")
      .filter(lcrUdf(col("_ta"), col("_tb")) >= cfg.containmentMinRun)
      .select("a", "b")
  }
}
