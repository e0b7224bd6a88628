package graft

import graft.functions.TextShingles

/** The row-local rolling-hash shingle kernels carry the SAME distinct-gram
  * identity as the string-set forms: set sizes match and pairwise Jaccard is
  * exact (31-bit collisions are negligible at test sizes). */
class ShingleSpec extends SparkSpec {

  private def naiveCharGrams(t: String, k: Int): Set[String] =
    if (t.length < k) Set.empty
    else (0 to t.length - k).map(i => t.substring(i, i + k)).toSet

  private def naiveWordNgrams(t: String, n: Int): Set[String] = {
    val w = t.split("\\s+").filter(_.nonEmpty)
    if (w.length < n) Set.empty
    else (0 to w.length - n).map(i => w.slice(i, i + n).mkString(" ")).toSet
  }

  private def jac[A](a: Set[A], b: Set[A]): Double =
    if (a.isEmpty && b.isEmpty) 0.0
    else a.intersect(b).size.toDouble / a.union(b).size

  test("char-gram hash sets: size and pairwise jaccard match the string sets") {
    val rng = new graft.sources.ClipCorpus.Rng(13L)
    def randText(n: Int): String =
      (0 until n).map(_ => (if (rng.nextInt(5) == 0) ' ' else ('a' + rng.nextInt(26)).toChar)).mkString
    (0 until 15).foreach { _ =>
      val base = randText(150 + rng.nextInt(200))
      val other = base.substring(0, base.length / 2) + randText(100)
      Seq(5, 8).foreach { k =>
        val ha = TextShingles.charGramHashes31Jvm(base, k)
        val hb = TextShingles.charGramHashes31Jvm(other, k)
        assert(ha.length == naiveCharGrams(base, k).size)
        val expect = jac(naiveCharGrams(base, k), naiveCharGrams(other, k))
        val got = graft.operators.PairVerifier.jaccardLongJvm(ha, hb)
        assert(math.abs(got - expect) < 1e-9, s"jaccard $got != $expect")
      }
    }
    assert(TextShingles.charGramHashes31Jvm("abc", 5).isEmpty)
    assert(TextShingles.charGramHashes31Jvm(null, 5).isEmpty)
  }

  test("word-ngram hash sets: size and pairwise jaccard match the string sets") {
    val rng = new graft.sources.ClipCorpus.Rng(14L)
    def randWords(n: Int): String =
      (0 until n).map(_ => "w" + rng.nextInt(50)).mkString(" ")
    (0 until 15).foreach { _ =>
      val a = randWords(30 + rng.nextInt(40))
      val b = a.split(" ").drop(5).mkString(" ") + " " + randWords(10)
      val ha = TextShingles.wordNgramHashes31Jvm(a, 2)
      val hb = TextShingles.wordNgramHashes31Jvm(b, 2)
      assert(ha.length == naiveWordNgrams(a, 2).size)
      val expect = jac(naiveWordNgrams(a, 2), naiveWordNgrams(b, 2))
      val got = graft.operators.PairVerifier.jaccardLongJvm(ha, hb)
      assert(math.abs(got - expect) < 1e-9, s"jaccard $got != $expect")
    }
    assert(TextShingles.wordNgramHashes31Jvm("one", 2).isEmpty)
  }

  test("hash range is MinHash-compatible: every value in [0, P)") {
    val h = TextShingles.charGramHashes31Jvm("the quick brown fox jumps over it", 5) ++
      TextShingles.wordNgramHashes31Jvm("the quick brown fox jumps over it", 2)
    assert(h.nonEmpty && h.forall(v => v >= 0 && v < graft.functions.Hashing.P))
  }
}
