package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/**
 * SimHash: 60-bit signature over a document's token multiset, reproducing the
 * semantics of the reference (literal_similarity.py:88-117 via
 * utils/distance.py:158-172): per-token 60-bit hash, per-bit ±weight
 * accumulation (weight = term frequency), sign → bit. Similarity
 * = 1 - hamming/width; the reference's near-dup tests pin sim > 0.5
 * (tests/test_literalsim.py:67-76).
 *
 * Width is 60 (not the reference's 64) because the portable hash is the first
 * 15 hex chars of md5 — self-consistency is what matters (SURVEY.md §2.2 P2),
 * and 60 bits keeps every value exactly reproducible in the DuckDB oracle
 * with no signed-overflow edge cases.
 *
 * Two implementations with identical output:
 *  - a row-local Scala function (exposed as a UDF): one pass per row, no
 *    shuffle — the hot path. A per-row signature is a pure projection; the
 *    groupBy formulation would shuffle the corpus twice for nothing.
 *  - generated SQL (explode + 60 conditional sums) for the DuckDB oracle.
 */
object SimHash {
  val Bits = 60

  /** Row-local signature of a token sequence (term frequency weighted). */
  def signatureJvm(tokens: Seq[String]): Long = {
    if (tokens.isEmpty) return 0L
    val counts = new java.util.HashMap[String, Int]()
    tokens.foreach(t => counts.merge(t, 1, Integer.sum))
    val acc = new Array[Long](Bits)
    counts.forEach { (tok, w) =>
      val h = Hashing.md5Hash60Jvm(tok)
      var b = 0
      while (b < Bits) {
        if (((h >>> b) & 1L) == 1L) acc(b) += w else acc(b) -= w
        b += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < Bits) { if (acc(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** Tokenization matching TextShingles.tokens (lowercase, collapse ws). */
  def tokenizeJvm(text: String): Seq[String] = {
    val t = text.toLowerCase.replaceAll("\\s+", " ").trim
    if (t.isEmpty) Seq.empty else scala.collection.immutable.ArraySeq.unsafeWrapArray(t.split(" "))
  }

  /** UDF column: simhash of a text column. */
  def simhash(spark: SparkSession, text: Column): Column = {
    val f = udf((s: String) => if (s == null) 0L else signatureJvm(tokenizeJvm(s)))
    f(text)
  }

  /** Hamming similarity 1 - popcount(a^b)/width (bit_count is codegen'd). */
  def hammingSim(a: Column, b: Column): Column =
    lit(1.0) - bit_count(a.bitwiseXOR(b)).cast("double") / lit(Bits.toDouble)

  /**
   * DuckDB SQL producing (sid, simhash) for `idExpr`/`textExpr` rows of
   * `from`. Tokens = lowercased whitespace split; weight = term frequency.
   */
  def oracleSql(idExpr: String, textExpr: String, from: String): String = {
    val bitSums = (0 until Bits).map { b =>
      s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN w ELSE -w END) AS s$b"
    }.mkString(", ")
    val sigExpr = (0 until Bits).map { b =>
      s"(CASE WHEN s$b > 0 THEN (CAST(1 AS BIGINT) << $b) ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH toks AS (
       |  SELECT $idExpr AS sid, unnest(string_split(trim(regexp_replace(lower($textExpr), '\\s+', ' ', 'g')), ' ')) AS tok
       |  FROM $from WHERE length(trim($textExpr)) > 0
       |), tf AS (
       |  SELECT sid, tok, COUNT(*) AS w FROM toks GROUP BY sid, tok
       |), hashed AS (
       |  SELECT sid, ${Hashing.md5Hash60Sql("tok")} AS h, w FROM tf
       |), bits AS (
       |  SELECT sid, $bitSums FROM hashed GROUP BY sid
       |)
       |SELECT sid, $sigExpr AS simhash FROM bits""".stripMargin
  }
}
