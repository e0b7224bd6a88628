package graft

import graft.config.DedupConfig
import graft.operators.{ContainmentJoin, SuffixArray}
import org.apache.spark.sql.functions.col

/** Pins the distributed suffix array and the exact substring-dup pass
  * against row-local brute force, and against the winnowing containment
  * backend (same predicate, independent algorithm). */
class SuffixArraySpec extends SparkSpec {
  import spark.implicits._

  private val rng = new graft.sources.ClipCorpus.Rng(77L)
  private def randText(n: Int, alpha: Int = 26): String =
    (0 until n).map(_ => ('a' + rng.nextInt(alpha)).toChar).mkString

  /** Brute-force generalized suffix array: code-point lexicographic order
    * (NOT java String order, which is UTF-16 code-unit order and disagrees
    * on non-BMP), ties by (id, pos). Returns (id, pos0, saPos1). */
  private def bruteSa(docs: Seq[(Long, String)]): Seq[(Long, Long, Long)] = {
    val sfx = for {
      (id, t) <- docs
      cps = t.codePoints().toArray
      p <- 0 until cps.length
    } yield (id, p.toLong, cps.drop(p))
    implicit val cpOrd: Ordering[Array[Int]] = (a: Array[Int], b: Array[Int]) => {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n && a(i) == b(i)) i += 1
      if (i < n) Integer.compare(a(i), b(i)) else Integer.compare(a.length, b.length)
    }
    sfx.sortBy { case (id, p, s) => (s, id, p) }
      .zipWithIndex
      .map { case ((id, p, _), i) => (id, p, i + 1L) }
      .sortBy(r => (r._1, r._2))
  }

  private def sparkSa(docs: Seq[(Long, String)]): Seq[(Long, Long, Long)] =
    SuffixArray.suffixArray(docs.toDF("doc_id", "t"), "doc_id", "t")
      .select(col("_id").cast("long"), col("_pos").cast("long"), col("sa_pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(r => (r._1, r._2))

  test("suffixArray == brute force on random multi-doc corpora") {
    val docs = (0L until 30L).map(i => (i, randText(20 + rng.nextInt(180), alpha = 4)))
    assert(sparkSa(docs) == bruteSa(docs))
  }

  test("suffixArray: repetitive text (ties deep past every doubling round)") {
    // "aaaa..." suffixes differ only in length; cross-doc identical suffixes
    // exercise the (id, pos) tie-break; "abab..." exercises period-2 ties
    val docs = Seq(
      (1L, "a" * 100), (2L, "a" * 64), (3L, "ab" * 50),
      (4L, "ba" * 30 + "b"), (5L, "a"), (6L, ""))
    assert(sparkSa(docs) == bruteSa(docs))
  }

  test("suffixArray: non-BMP code points order by code point, not UTF-16 unit") {
    // U+1D11E (surrogate pair in UTF-16) vs U+FFFD: code-point order puts
    // FFFD first; naive java compareTo would reverse them
    val docs = Seq((1L, "x𝄞y"), (2L, "x�y"), (3L, "xay"))
    assert(sparkSa(docs) == bruteSa(docs))
  }

  /** Brute LCP array: code-point LCP of each SA-adjacent suffix pair. */
  private def bruteLcp(docs: Seq[(Long, String)]): Seq[(Long, Long, Long, Long)] = {
    val sa = bruteSa(docs).sortBy(_._3) // by sa_pos
    val cps = docs.toMap.view.mapValues(_.codePoints().toArray).toMap
    def sfx(id: Long, p: Long): Array[Int] = cps(id).drop(p.toInt)
    sa.zipWithIndex.map { case ((id, p, sp), i) =>
      val lcp = if (i == 0) 0L else {
        val (pid, pp, _) = sa(i - 1)
        val a = sfx(id, p); val b = sfx(pid, pp)
        var k = 0
        while (k < math.min(a.length, b.length) && a(k) == b(k)) k += 1
        k.toLong
      }
      (id, p, sp, lcp)
    }.sortBy(r => (r._1, r._2))
  }

  test("lcpArray == brute force (incl. repetitive ties and non-BMP)") {
    val docs = (0L until 12L).map(i => (i, randText(20 + rng.nextInt(120), alpha = 3))) ++
      Seq((20L, "ab" * 40), (21L, "ab" * 25 + "a"), (22L, "x𝄞y𝄞z"), (23L, "x𝄞y𝄞w"))
    val got = SuffixArray.lcpArray(docs.toDF("doc_id", "t"), "doc_id", "t")
      .select(col("_id").cast("long"), col("_pos").cast("long"), col("sa_pos"), col("lcp"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(r => (r._1, r._2))
    val want = bruteLcp(docs)
    assert(got.nonEmpty && got.exists(_._4 > 0))
    assert(got == want)
  }

  test("lcpArrayScaled == brute force (multi-level descent, clamps, non-BMP)") {
    // identical docs force the full-remainder clamp at the top level;
    // a planted 150-char shared run forces LCPs far past InitK (multi-level
    // descent with a sub-InitK residue); repetitive + non-BMP docs pin the
    // tie and code-point paths; random docs cover the general case
    val run = randText(150)
    val docs = (0L until 8L).map(i => (i, randText(20 + rng.nextInt(120), alpha = 3))) ++
      Seq((20L, "ab" * 40), (21L, "ab" * 25 + "a"),
        (22L, "x𝄞y𝄞z"), (23L, "x𝄞y𝄞w"),
        (24L, randText(30) + run + randText(20)), (25L, run + randText(60)),
        (26L, "samedoc" * 12), (27L, "samedoc" * 12),
        (28L, "a"), (29L, ""))
    val got = SuffixArray.lcpArrayScaled(docs.toDF("doc_id", "t"), "doc_id", "t")
      .select(col("_id").cast("long"), col("_pos").cast("long"), col("sa_pos"), col("lcp"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(r => (r._1, r._2))
    val want = bruteLcp(docs.filter(_._2.nonEmpty))
    assert(got.exists(_._4 >= 150)) // the planted run actually exercised descent
    assert(got == want)
  }

  test("substringPairs: exact — equals brute-force shared-run check, planted runs") {
    val minRun = 70
    val shared1 = randText(minRun) // exactly minRun
    val shared2 = randText(minRun + 40)
    val almost = randText(minRun - 1) // one short of the threshold
    val docs = Seq(
      1L -> (randText(50) + shared1 + randText(60)),
      2L -> (shared1 + randText(150)),
      3L -> (randText(80) + shared2),
      4L -> (randText(10) + shared2 + randText(10)),
      5L -> (randText(40) + almost + randText(40)),
      6L -> (randText(30) + almost + randText(70)),
      7L -> randText(300),
      8L -> randText(40) // shorter than minRun
    )
    val got = SuffixArray.substringPairs(docs.toDF("doc_id", "t"), "doc_id", "t", minRun)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (a, ta) <- docs; (b, tb) <- docs if a < b
      if ContainmentJoin.longestCommonRunJvm(ta, tb) >= minRun
    } yield (a, b)).toSet
    assert(want.contains((1L, 2L)) && want.contains((3L, 4L)) && !want.contains((5L, 6L)))
    assert(got == want)
  }

  test("substringPairs: randomized stress — binary alphabet, heavy repetition, d=16 path") {
    // minRun 24 forces d = 16 (not InitK) and a 2-window key with offsets
    // (0, 8); alphabet-2 text maximizes repeated grams and rank-class ties
    val minRun = 24
    val docs = (0L until 100L).map(i => (i, randText(60 + rng.nextInt(180), alpha = 2)))
    val got = SuffixArray.substringPairs(docs.toDF("doc_id", "t"), "doc_id", "t", minRun)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (a, ta) <- docs; (b, tb) <- docs if a < b
      if ContainmentJoin.longestCommonRunJvm(ta, tb) >= minRun
    } yield (a, b)).toSet
    assert(want.nonEmpty, "stress fixture planted no shared runs — resize it")
    assert(got == want)
  }

  test("substringPairs == winnowing containment pairs (independent backends)") {
    val cfg = DedupConfig.default.copy(containmentMaxBucket = Int.MaxValue)
    val minRun = cfg.containmentMinRun
    val docs = (0L until 40L).map { i =>
      val base = randText(100 + rng.nextInt(200))
      (i, base)
    } ++ (0L until 12L).map { i =>
      // plant: doc 100+i shares a >=minRun run with doc i
      val donorText = randText(minRun + rng.nextInt(50))
      (100L + i, randText(rng.nextInt(80)) + donorText + randText(rng.nextInt(80)))
    }
    // make the donors real: append each donor run into doc i as well
    val donors = (0L until 12L).map { i =>
      val d = docs.find(_._1 == 100L + i).get._2
      val run = d.substring(math.min(20, d.length - minRun).max(0))
      (i, docs.find(_._1 == i).get._2 + run)
    }.toMap
    val corpus = docs.map { case (id, t) => (id, donors.getOrElse(id, t)) }
    val df = corpus.toDF("doc_id", "t")
    val sa = SuffixArray.substringPairs(df, "doc_id", "t", minRun)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val winnow = ContainmentJoin.pairs(df, "doc_id", "t", cfg)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sa.nonEmpty)
    assert(sa == winnow)
  }

  test("substringPairs: maxClass drops boilerplate runs shared by many docs") {
    val run = randText(80)
    // per-doc UNIQUE affix chars: windows straddling the run boundary must
    // not match across docs (a random affix char occasionally matches,
    // legitimately producing a small class = a real 70-char shared run)
    val docs = (0L until 10L).map(i =>
      (i, ('0' + i).toChar.toString * 20 + run + ('A' + i).toChar.toString * 20))
    val exact = SuffixArray.substringPairs(docs.toDF("doc_id", "t"), "doc_id", "t", 70)
    assert(exact.count() == 45L) // all C(10,2) pairs
    val capped = SuffixArray.substringPairs(
      docs.toDF("doc_id", "t"), "doc_id", "t", 70, maxClass = 5)
    assert(capped.count() == 0L)
  }

  test("rankAttach: dense 1..n global rank over DUPLICATE keys, any partitioning") {
    // each key appears 1-3 times; ranks must be equal within a key and
    // densely cover 1..999 across keys
    val rows = (1 to 999).flatMap(i => Seq.fill(1 + i % 3)(f"k$i%04d"))
    val keys = rows.map(k => (k, rng.nextLong())).sortBy(_._2).map(_._1)
      .toDF("_g").repartition(7)
    val (ranked, n, free) = SuffixArray.rankAttach(keys, Seq("_g"), "r")
    val got = ranked.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(n == 999L)
    val byKey = got.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    assert(byKey.values.forall(_.size == 1), "a key got two different ranks")
    val rankOfKey = byKey.view.mapValues(_.head).toMap.toSeq.sortBy(_._1)
    assert(rankOfKey.map(_._2) == (1L to 999L), "ranks not dense 1..n in key order")
    free()
  }
}
