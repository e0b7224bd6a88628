package graft.queries

import graft.queries.Tables.NormSql
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Scalar similarity / normalization / profile operators from the reference's
 * utility layer, each as an oracle-checked query:
 *  - edit-distance similarity join with blocking (utils/distance.py:81-90,
 *    is_str_match 107-112) — G7
 *  - char-set overlap sim max(|A∩B|/|A|, |A∩B|/|B|)
 *    (literal_similarity.py:942-947 SameChars) — SO1
 *  - min-max normalization (utils/distance.py:175-195) — P16
 *  - value histogram (improved_faiss_detector.py:224-227) — A3
 *  - TF-IDF top term per doc w/ smoothed idf (utils/tfidf.py:50-71) — P4
 *  - embedding near-dup pairs (the cosine threshold dedup of
 *    clip_test.py:240) — J4 on vectors
 */
object SimilarityFunctions {

  /** Edit-distance similarity join, blocked by (lang, source) + length
    * window — the scalable shape of a Levenshtein verify (never all-pairs). */
  val levenshteinPairs = QueryDef(
    "q_levenshtein_pairs",
    (spark, dir) => {
      val d = Tables.documents(spark, dir)
        .select(col("doc_id"), Tables.normText(col("text")).as("t"),
          col("lang"), col("source"), col("n_chars"))
      val a = d.select(col("doc_id").as("a"), col("t").as("ta"),
        col("lang"), col("source"), col("n_chars").as("ca"))
      val b = d.select(col("doc_id").as("b"), col("t").as("tb"),
        col("lang"), col("source"), col("n_chars").as("cb"))
      a.join(b, Seq("lang", "source"))
        .filter(col("a") < col("b") && abs(col("ca") - col("cb")) <= 16)
        .withColumn("lev", levenshtein(col("ta"), col("tb")).cast("long"))
        .withColumn("sim",
          lit(1.0) - col("lev").cast("double") / greatest(length(col("ta")), length(col("tb"))))
        .filter(col("sim") >= 0.5)
        .select(col("a"), col("b"), col("lev"), col("sim"))
        .orderBy("a", "b")
    },
    Some(s"""WITH d AS (SELECT doc_id, $NormSql AS t, lang, source, n_chars FROM documents)
      |SELECT x.doc_id AS a, y.doc_id AS b,
      |       CAST(levenshtein(x.t, y.t) AS BIGINT) AS lev,
      |       1.0 - CAST(levenshtein(x.t, y.t) AS DOUBLE) /
      |             greatest(length(x.t), length(y.t)) AS sim
      |FROM d x JOIN d y ON x.lang = y.lang AND x.source = y.source
      |  AND x.doc_id < y.doc_id AND abs(x.n_chars - y.n_chars) <= 16
      |WHERE 1.0 - CAST(levenshtein(x.t, y.t) AS DOUBLE) /
      |      greatest(length(x.t), length(y.t)) >= 0.5
      |ORDER BY a, b""".stripMargin))

  /** SameChars overlap sim over distinct character sets, same blocking. */
  val charsetOverlapPairs = QueryDef(
    "q_charset_overlap_pairs",
    (spark, dir) => {
      val d = Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"), col("source"),
          array_distinct(split(Tables.normText(col("text")), "")).as("cs"))
      val a = d.select(col("doc_id").as("a"), col("lang"), col("source"), col("cs").as("csa"))
      val b = d.select(col("doc_id").as("b"), col("lang"), col("source"), col("cs").as("csb"))
      a.join(b, Seq("lang", "source")).filter(col("a") < col("b"))
        .withColumn("inter", size(array_intersect(col("csa"), col("csb"))).cast("double"))
        .withColumn("sim", greatest(col("inter") / size(col("csa")),
          col("inter") / size(col("csb"))))
        .filter(col("sim") >= 0.95)
        .select(col("a"), col("b"), col("sim"))
        .orderBy("a", "b")
    },
    Some(s"""WITH d AS (
      |  SELECT doc_id, lang, source, list_distinct(string_split($NormSql, '')) AS cs
      |  FROM documents
      |), p AS (
      |  SELECT x.doc_id AS a, y.doc_id AS b,
      |         CAST(len(list_intersect(x.cs, y.cs)) AS DOUBLE) AS inter,
      |         len(x.cs) AS na, len(y.cs) AS nb
      |  FROM d x JOIN d y ON x.lang = y.lang AND x.source = y.source AND x.doc_id < y.doc_id
      |)
      |SELECT a, b, greatest(inter / na, inter / nb) AS sim FROM p
      |WHERE greatest(inter / na, inter / nb) >= 0.95
      |ORDER BY a, b""".stripMargin))

  /** Min-max normalization of event values per event type. */
  val minmaxNorm = QueryDef(
    "q_minmax_norm",
    (spark, dir) => {
      val w = Window.partitionBy("event_type")
      Tables.events(spark, dir)
        .withColumn("vmin", min(col("value")).over(w))
        .withColumn("vmax", max(col("value")).over(w))
        .select(col("event_id"), col("event_type"),
          ((col("value") - col("vmin")) / (col("vmax") - col("vmin"))).as("vnorm"))
        .orderBy("event_id")
    },
    Some("""WITH m AS (
      |  SELECT event_id, event_type, value,
      |         min(value) OVER (PARTITION BY event_type) AS vmin,
      |         max(value) OVER (PARTITION BY event_type) AS vmax
      |  FROM events
      |)
      |SELECT event_id, event_type, (value - vmin) / (vmax - vmin) AS vnorm
      |FROM m ORDER BY event_id""".stripMargin))

  /** 16-bucket histogram of event values (bounds from the data). */
  val valueHistogram = QueryDef(
    "q_value_histogram",
    (spark, dir) => {
      val ev = Tables.events(spark, dir)
      val b = ev.agg(min(col("value")).as("vmin"), max(col("value")).as("vmax"))
      ev.crossJoin(broadcast(b))
        .select(least(lit(15), floor((col("value") - col("vmin")) /
          (col("vmax") - col("vmin")) * 16).cast("long")).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .orderBy("bucket")
    },
    Some("""WITH b AS (SELECT min(value) AS vmin, max(value) AS vmax FROM events)
      |SELECT least(15, CAST(floor((value - vmin) / (vmax - vmin) * 16) AS BIGINT)) AS bucket,
      |       count(*) AS n
      |FROM events, b GROUP BY 1 ORDER BY bucket""".stripMargin))

  /** TF-IDF (smoothed idf, sklearn-style) top term per doc. */
  val tfidfTopTerm = QueryDef(
    "q_tfidf_top_term",
    (spark, dir) => {
      val toks = Tables.documents(spark, dir)
        .select(col("doc_id"), explode(split(Tables.normText(col("text")), " ")).as("tok"))
      val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val dfreq = toks.select("doc_id", "tok").distinct()
        .groupBy("tok").agg(count(lit(1)).as("dfreq"))
      val n = Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(dfreq, "tok").crossJoin(broadcast(n))
        .withColumn("tfidf", round(col("tf") *
          (log((col("n_docs") + 1.0) / (col("dfreq") + 1.0)) + 1.0), 9))
      scored
        .withColumn("rk", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("tok"))))
        .filter(col("rk") === 1)
        .select(col("doc_id"), col("tok").as("top_term"), col("tfidf"))
        .orderBy("doc_id")
    },
    Some(s"""WITH toks AS (
      |  SELECT doc_id, unnest(string_split($NormSql, ' ')) AS tok FROM documents
      |), tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
      |dfreq AS (SELECT tok, count(DISTINCT doc_id) AS dfreq FROM toks GROUP BY tok),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT doc_id, tok,
      |         round(tf * (ln((n_docs + 1.0) / (dfreq + 1.0)) + 1.0), 9) AS tfidf
      |  FROM tf JOIN dfreq USING (tok), n
      |), ranked AS (
      |  SELECT doc_id, tok, tfidf,
      |         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rk
      |  FROM scored
      |)
      |SELECT doc_id, tok AS top_term, tfidf FROM ranked WHERE rk = 1
      |ORDER BY doc_id""".stripMargin))

  /** Embedding near-dup pairs: exact cosine threshold join (the reference's
    * brute-force CLIP dedup scan at a fixed threshold). */
  val embeddingDupPairs = QueryDef(
    "q_embedding_dup_pairs",
    (spark, dir) => {
      val dot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
        aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, x) => acc + x)
      val v = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"),
          dot(col("embedding"), col("embedding")).as("n2"))
      val a = v.select(col("vec_id").as("a"), col("embedding").as("ea"), col("n2").as("na"))
      val b = v.select(col("vec_id").as("b"), col("embedding").as("eb"), col("n2").as("nb"))
      a.join(b, col("a") < col("b"))
        .withColumn("cos", dot(col("ea"), col("eb")) / (sqrt(col("na")) * sqrt(col("nb"))))
        .filter(col("cos") >= 0.45)
        .select(col("a"), col("b"), col("cos"))
        .orderBy("a", "b")
    },
    Some {
      def dotSql(a: String, b: String) =
        (1 to EmbeddingQueries.Dim)
          .map(i => s"CAST($a[$i] AS DOUBLE) * CAST($b[$i] AS DOUBLE)")
          .mkString("(", " + ", ")")
      s"""WITH v AS (SELECT vec_id, embedding, ${dotSql("embedding", "embedding")} AS n2 FROM embeddings),
        |p AS (
        |  SELECT x.vec_id AS a, y.vec_id AS b,
        |         ${dotSql("x.embedding", "y.embedding")} / (sqrt(x.n2) * sqrt(y.n2)) AS cos
        |  FROM v x JOIN v y ON x.vec_id < y.vec_id
        |)
        |SELECT a, b, cos FROM p WHERE cos >= 0.45 ORDER BY a, b""".stripMargin
    })

  val all: Seq[QueryDef] = Seq(levenshteinPairs, charsetOverlapPairs,
    minmaxNorm, valueHistogram, tfidfTopTerm, embeddingDupPairs)
}
