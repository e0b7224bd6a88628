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

  /** DuckDB SQL: one row per distinct char k-gram of `textExpr` in table `t`.
    * Emits `SELECT <id>, gram` rows; caller wraps/joins. */
  def charShingleSql(idExpr: String, textExpr: String, k: Int, from: String): String =
    s"""SELECT DISTINCT $idExpr AS sid, substr($textExpr, CAST(i AS INT), $k) AS gram
       |FROM $from, range(1, length($textExpr) - ${k - 2}) t(i)
       |WHERE length($textExpr) >= $k""".stripMargin
}
