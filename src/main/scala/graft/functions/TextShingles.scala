package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Shingle (k-gram) generation over text, pure Catalyst built-ins
 * (sequence + transform + substr) — no UDF, stays inside whole-stage codegen.
 *
 * The reference shingles implicitly through jieba tokenization + TF-IDF
 * (literal_similarity.py:88-117); the graft uses character k-grams for
 * transcripts (language-independent) and word n-grams where token semantics
 * matter.
 */
object TextShingles {

  /** All character k-grams (with duplicates) of `text`; empty array if shorter than k. */
  def charGrams(text: Column, k: Int): Column =
    when(length(text) >= k,
      transform(sequence(lit(1), length(text) - (k - 1)), i => text.substr(i, lit(k))))
      .otherwise(array().cast("array<string>"))

  /** Distinct character k-grams — the shingle *set* used for Jaccard. */
  def charShingles(text: Column, k: Int): Column = array_distinct(charGrams(text, k))

  /** Character k-grams sampled at a fixed stride (offset ≡ 1 mod stride). */
  def stridedCharGrams(text: Column, k: Int, stride: Int): Column =
    when(length(text) >= k,
      transform(
        sequence(lit(0), (length(text) - k) / stride),
        j => text.substr(j * stride + 1, lit(k))))
      .otherwise(array().cast("array<string>"))

  /** Whitespace tokenization (lowercased, collapsed whitespace). */
  def tokens(text: Column): Column =
    split(trim(regexp_replace(lower(text), "\\s+", " ")), " ")

  /** Distinct word n-grams joined by a single space. */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
        .otherwise(array().cast("array<string>")))
  }

  /** Hash a string-shingle array to distinct SORTED 31-bit hashes in [0, P)
    * (sorted once per row so the pair-verify merge kernel never re-sorts). */
  def hashShingles(shingles: Column, portable: Boolean): Column = {
    val h: Column => Column = if (portable) Hashing.md5Hash31 else Hashing.fastHash31
    sort_array(array_distinct(transform(shingles, h)))
  }

  // ---- row-local fast path (pipeline; oracle queries keep the Catalyst
  // forms above, which DuckDB can reproduce) ----

  private def mix64(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private val B = 0x100000001b3L

  /** Distinct sorted 31-bit char k-gram hashes in [0, P) — rolling
    * polynomial + mix64, ONE pass, zero per-gram string allocation (the
    * Catalyst transform+xxhash64 form allocates a UTF8String per gram and
    * was the signature stage's top cost). MinHash-compatible range. */
  def charGramHashes31Jvm(text: String, k: Int): Array[Long] = {
    if (text == null || text.length < k) return Array.empty
    val n = text.length - k + 1
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= B; i += 1 }
    val buf = new Array[Long](n)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + text.charAt(i); i += 1 }
    buf(0) = java.lang.Math.floorMod(mix64(h), Hashing.P)
    i = 1
    while (i < n) {
      h = (h - text.charAt(i - 1) * pow) * B + text.charAt(i + k - 1)
      buf(i) = java.lang.Math.floorMod(mix64(h), Hashing.P)
      i += 1
    }
    AudioPcm.sortedDistinct(buf, n)
  }

  /** Distinct sorted 31-bit word n-gram hashes (whitespace tokens,
    * lowercase handled by the caller) in [0, P). */
  def wordNgramHashes31Jvm(text: String, n: Int): Array[Long] = {
    if (text == null) return Array.empty
    val words = text.split("\\s+").filter(_.nonEmpty)
    if (words.length < n) return Array.empty
    val wh = new Array[Long](words.length)
    var i = 0
    while (i < words.length) {
      val w = words(i)
      var h = 0L
      var j = 0
      while (j < w.length) { h = h * B + w.charAt(j); j += 1 }
      wh(i) = mix64(h)
      i += 1
    }
    val out = new Array[Long](words.length - n + 1)
    i = 0
    while (i <= words.length - n) {
      var h = 0L
      var j = 0
      while (j < n) { h = h * 0x9e3779b97f4a7c15L + wh(i + j); j += 1 }
      out(i) = java.lang.Math.floorMod(mix64(h), Hashing.P)
      i += 1
    }
    AudioPcm.sortedDistinct(out, out.length)
  }

  def charGramHashesUdf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((t: String) => charGramHashes31Jvm(t, k))
  def wordNgramHashesUdf(n: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((t: String) => wordNgramHashes31Jvm(t, n))

  /** DuckDB SQL: one row per distinct char k-gram of `textExpr` in table `t`.
    * Emits `SELECT <id>, gram` rows; caller wraps/joins. */
  def charShingleSql(idExpr: String, textExpr: String, k: Int, from: String): String =
    s"""SELECT DISTINCT $idExpr AS sid, substr($textExpr, CAST(i AS INT), $k) AS gram
       |FROM $from, range(1, length($textExpr) - ${k - 2}) t(i)
       |WHERE length($textExpr) >= $k""".stripMargin
}
