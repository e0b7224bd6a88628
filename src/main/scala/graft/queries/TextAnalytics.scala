package graft.queries

import graft.functions.Hashing
import org.apache.spark.sql.functions._

/**
 * Text-analysis projections a large-scale training-data pipeline needs over
 * the `documents` table: token statistics, quality scoring, language-ID
 * (marker-token heuristic), content fingerprinting. All pure per-row /
 * per-group Catalyst plans (whole-stage codegen, no UDFs), each with an
 * exact DuckDB oracle.
 *
 * The reference's analogs: tokenize + stopword filter
 * (similarities/utils/tfidf.py:64-65), corpus stats
 * (similarities/utils/rank_bm25.py:18-58), MD5 content identity
 * (improved_faiss_detector.py:41-50).
 */
object TextAnalytics {

  private val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it")
  private val stopSqlList = Stopwords.map(s => s"'$s'").mkString(", ")

  // language marker tokens -> predicted language; ties broken by this order.
  private val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of"),
    "fr" -> Seq("le", "la", "et", "les"),
    "de" -> Seq("der", "und", "die", "das"),
    "es" -> Seq("el", "los", "y", "las"))

  val tokenStats = QueryDef(
    "q_token_stats",
    (spark, dir) => {
      val norm = Tables.normText(col("text"))
      val toks = split(norm, " ")
      Tables.documents(spark, dir).select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct_tokens"),
        ((length(norm) - (size(toks) - 1)).cast("double") / size(toks))
          .as("avg_token_len"))
        .orderBy("doc_id")
    },
    Some(s"""WITH n AS (SELECT doc_id, ${Tables.NormSql} AS t FROM documents),
      |tk AS (SELECT doc_id, t, string_split(t, ' ') AS toks FROM n)
      |SELECT doc_id, len(toks) AS n_tokens,
      |       len(list_distinct(toks)) AS n_distinct_tokens,
      |       CAST(length(t) - (len(toks) - 1) AS DOUBLE) / len(toks) AS avg_token_len
      |FROM tk ORDER BY doc_id""".stripMargin))

  /** BPE-ish subword counting: the GPT-2-style pre-tokenizer approximated
    * as alpha runs | digit runs | single punctuation (a regex both Java and
    * DuckDB RE2 interpret identically), plus FERTILITY (subtokens per
    * whitespace token) — the standard budget metric for how many model
    * tokens a corpus costs relative to its word count. */
  val SubwordPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  val subwordStats = QueryDef(
    "q_subword_stats",
    (spark, dir) => {
      val norm = Tables.normText(col("text"))
      val toks = split(norm, " ")
      val sub = regexp_extract_all(norm, lit(SubwordPattern), lit(0))
      Tables.documents(spark, dir).select(
        col("doc_id"),
        size(sub).cast("long").as("n_subtokens"),
        size(array_distinct(sub)).cast("long").as("n_distinct_subtokens"),
        (size(sub).cast("double") / size(toks)).as("fertility"))
        .orderBy("doc_id")
    },
    Some(s"""WITH n AS (SELECT doc_id, ${Tables.NormSql} AS t FROM documents),
      |tk AS (SELECT doc_id, t, string_split(t, ' ') AS toks,
      |              regexp_extract_all(t, '$SubwordPattern') AS sub FROM n)
      |SELECT doc_id, len(sub) AS n_subtokens,
      |       len(list_distinct(sub)) AS n_distinct_subtokens,
      |       CAST(len(sub) AS DOUBLE) / len(toks) AS fertility
      |FROM tk ORDER BY doc_id""".stripMargin))

  val langProfile = QueryDef(
    "q_lang_profile",
    (spark, dir) =>
      Tables.documents(spark, dir)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"),
          min(col("n_chars")).cast("long").as("min_chars"),
          max(col("n_chars")).cast("long").as("max_chars"),
          percentile(col("n_chars"), lit(0.5)).as("median_chars"))
        .orderBy("lang"),
    Some("""SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |       min(n_chars) AS min_chars, max(n_chars) AS max_chars,
      |       median(n_chars) AS median_chars
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin))

  /** Quality scoring: stopword ratio, repetition (distinct/total tokens),
    * length band — the length/punct/stopword heuristics of web-corpus
    * quality filters (per-row, exact rational arithmetic). */
  val qualityScore = QueryDef(
    "q_quality_score",
    (spark, dir) => {
      val norm = Tables.normText(col("text"))
      val toks = split(norm, " ")
      val nTok = size(toks)
      val nStop = size(filter(toks, t => t.isin(Stopwords: _*)))
      val nDistinct = size(array_distinct(toks))
      Tables.documents(spark, dir).select(
        col("doc_id"),
        (nStop.cast("double") / nTok).as("stop_ratio"),
        (nDistinct.cast("double") / nTok).as("distinct_ratio"),
        when(nTok < 10, "too_short")
          .when(nTok > 500, "too_long")
          .when(nDistinct.cast("double") / nTok < 0.2, "repetitive")
          .otherwise("ok").as("quality"))
        .orderBy("doc_id")
    },
    Some(s"""WITH n AS (SELECT doc_id, string_split(${Tables.NormSql}, ' ') AS toks FROM documents),
      |m AS (SELECT doc_id, len(toks) AS nt,
      |             len(list_filter(toks, t -> t IN ($stopSqlList))) AS ns,
      |             len(list_distinct(toks)) AS nd
      |      FROM n)
      |SELECT doc_id,
      |       CAST(ns AS DOUBLE) / nt AS stop_ratio,
      |       CAST(nd AS DOUBLE) / nt AS distinct_ratio,
      |       CASE WHEN nt < 10 THEN 'too_short'
      |            WHEN nt > 500 THEN 'too_long'
      |            WHEN CAST(nd AS DOUBLE) / nt < 0.2 THEN 'repetitive'
      |            ELSE 'ok' END AS quality
      |FROM m ORDER BY doc_id""".stripMargin))

  /** Language-ID by marker-token counts; deterministic tie-break = marker
    * declaration order, no markers -> 'und'. */
  val langId = QueryDef(
    "q_lang_id",
    (spark, dir) => {
      val toks = split(Tables.normText(col("text")), " ")
      val counts = Markers.map { case (lang, ms) =>
        lang -> size(filter(toks, t => t.isin(ms: _*)))
      }
      // argmax with declaration-order tie-break via fold
      val pred = counts.foldLeft((lit("und"), lit(0))) {
        case ((bestLang, bestN), (lang, n)) =>
          (when(n > bestN, lit(lang)).otherwise(bestLang),
            when(n > bestN, n).otherwise(bestN))
      }
      Tables.documents(spark, dir).select(
        col("doc_id"),
        pred._1.as("pred_lang"),
        pred._2.cast("long").as("marker_hits"))
        .orderBy("doc_id")
    },
    Some {
      val cnts = Markers.map { case (lang, ms) =>
        val lst = ms.map(m => s"'$m'").mkString(", ")
        s"len(list_filter(toks, t -> t IN ($lst))) AS c_$lang"
      }.mkString(", ")
      // fold in the same declaration order as the Spark side
      val (predExpr, hitExpr) = Markers.foldLeft(("'und'", "0")) {
        case ((pl, pn), (lang, _)) =>
          (s"CASE WHEN c_$lang > ($pn) THEN '$lang' ELSE ($pl) END",
            s"CASE WHEN c_$lang > ($pn) THEN c_$lang ELSE ($pn) END")
      }
      s"""WITH n AS (SELECT doc_id, string_split(${Tables.NormSql}, ' ') AS toks FROM documents),
        |m AS (SELECT doc_id, $cnts FROM n)
        |SELECT doc_id, $predExpr AS pred_lang, CAST($hitExpr AS BIGINT) AS marker_hits
        |FROM m ORDER BY doc_id""".stripMargin
    })

  /** 60-bit portable content fingerprint + 31-bit prefix fingerprint. */
  val docFingerprint = QueryDef(
    "q_doc_fingerprint",
    (spark, dir) => {
      val norm = Tables.normText(col("text"))
      Tables.documents(spark, dir).select(
        col("doc_id"),
        Hashing.md5Hash60(norm).as("fp60"),
        Hashing.md5Hash31(substring(norm, 1, 64)).as("fp_prefix"))
        .orderBy("doc_id")
    },
    Some(s"""WITH n AS (SELECT doc_id, ${Tables.NormSql} AS t FROM documents)
      |SELECT doc_id, ${Hashing.md5Hash60Sql("t")} AS fp60,
      |       ${Hashing.md5Hash31Sql("substr(t, 1, 64)")} AS fp_prefix
      |FROM n ORDER BY doc_id""".stripMargin))

  val all: Seq[QueryDef] =
    Seq(tokenStats, subwordStats, langProfile, qualityScore, langId,
      docFingerprint)
}
