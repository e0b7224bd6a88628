package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Retrieval operators: BM25 scoring (the reference's rank_bm25.py:18-114
 * Okapi family, Lucene "+1" idf variant so the formula is positive without
 * the epsilon-floor second pass), reciprocal-rank fusion
 * (ensemble_similarity.py:130-170, c=60), and per-group top-k windows
 * (the reference's ubiquitous sort-desc-take-n, utils/util.py:145-165).
 *
 * Per-doc BM25 totals are built as per-term conditional sums added in a fixed
 * written order — never a float SUM over a group — so Spark and the DuckDB
 * oracle produce bit-identical doubles regardless of partitioning.
 */
object Retrieval {
  val QueryTerms = Seq("spark", "join", "window", "stream")
  val K1 = 1.5
  val B = 0.75
  val RrfC = 60

  private val termList = QueryTerms.map(t => s"'$t'").mkString(", ")

  val bm25 = QueryDef(
    "q_bm25",
    (spark, dir) => {
      val toks = Tables.documents(spark, dir)
        .select(col("doc_id"), explode(split(Tables.normText(col("text")), " ")).as("tok"))
      val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
      val qtoks = toks.filter(col("tok").isin(QueryTerms: _*))
      val tf = qtoks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val dfreq = qtoks.select("doc_id", "tok").distinct()
        .groupBy("tok").agg(count(lit(1)).as("dfreq"))
      val scored = tf.join(dfreq, "tok").join(dl, "doc_id").crossJoin(broadcast(stats))
        .withColumn("idf",
          log((col("n_docs") - col("dfreq") + 0.5) / (col("dfreq") + 0.5) + 1.0))
        .withColumn("tscore",
          col("idf") * (col("tf") * (K1 + 1.0) /
            (col("tf") + ((col("dl").cast("double") / col("avgdl")) * B + (1.0 - B)) * K1)))
      // fixed-order per-term addition (exact reproducibility; see header)
      val perTerm = QueryTerms.map(t =>
        coalesce(max(when(col("tok") === t, col("tscore"))), lit(0.0)))
      val total = perTerm.reduceLeft(_ + _)
      val byDoc = scored.groupBy("doc_id").agg(total.as("score"))
      byDoc
        .withColumn("rk", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id"))))
        .filter(col("rk") <= 20)
        // libm ln differs between the JVM and DuckDB in the last ULP — round
        // to 9 decimals on BOTH sides (everything upstream is bit-exact).
        .select(col("doc_id"), col("rk").cast("long").as("rk"),
          round(col("score"), 9).as("score"))
        .orderBy("rk")
    },
    Some {
      val perTerm = QueryTerms.map(t =>
        s"coalesce(max(CASE WHEN tok = '$t' THEN tscore END), 0.0)").mkString(" + ")
      s"""WITH toks AS (
        |  SELECT doc_id, unnest(string_split(${Tables.NormSql}, ' ')) AS tok FROM documents
        |), dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |qt AS (SELECT doc_id, tok FROM toks WHERE tok IN ($termList)),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM qt GROUP BY doc_id, tok),
        |dfreq AS (SELECT tok, count(DISTINCT doc_id) AS dfreq FROM qt GROUP BY tok),
        |scored AS (
        |  SELECT tf.doc_id, tf.tok,
        |         ln((n_docs - dfreq + 0.5) / (dfreq + 0.5) + 1.0) *
        |         (tf * ${K1 + 1.0} /
        |          (tf + $K1 * ((1.0 - $B) + $B * (CAST(dl AS DOUBLE) / avgdl)))) AS tscore
        |  FROM tf JOIN dfreq USING (tok) JOIN dl USING (doc_id), stats
        |), byDoc AS (SELECT doc_id, $perTerm AS score FROM scored GROUP BY doc_id),
        |ranked AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rk, score FROM byDoc)
        |SELECT doc_id, rk, round(score, 9) AS score FROM ranked WHERE rk <= 20 ORDER BY rk""".stripMargin
    })

  /** BM25L / BM25Plus variants (reference utils/rank_bm25.py:117-161): same
    * tokenization/corpus stats as q_bm25, different saturation + idf forms.
    * BM25L (delta=0.5): idf = ln((N+1)/(df+0.5)),
    *   score = idf * (k1+1)*(ctd+delta)/(k1+ctd+delta), ctd = tf/(1-b+b*dl/avgdl)
    * BM25Plus (delta=1): idf = ln((N+1)/df),
    *   score = idf * (delta + tf*(k1+1)/(k1*(1-b+b*dl/avgdl)+tf)) */
  private def bm25Variant(name: String, variant: String): QueryDef = QueryDef(
    name,
    (spark, dir) => {
      val toks = Tables.documents(spark, dir)
        .select(col("doc_id"), explode(split(Tables.normText(col("text")), " ")).as("tok"))
      val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
      val qtoks = toks.filter(col("tok").isin(QueryTerms: _*))
      val tf = qtoks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val dfreq = qtoks.select("doc_id", "tok").distinct()
        .groupBy("tok").agg(count(lit(1)).as("dfreq"))
      val dlNorm = (col("dl").cast("double") / col("avgdl")) * B + (1.0 - B)
      val scoredBase = tf.join(dfreq, "tok").join(dl, "doc_id").crossJoin(broadcast(stats))
      val scored = variant match {
        case "l" =>
          val ctd = col("tf") / dlNorm
          scoredBase
            .withColumn("idf", log((col("n_docs") + 1.0) / (col("dfreq") + 0.5)))
            .withColumn("tscore",
              col("idf") * (K1 + 1.0) * (ctd + 0.5) / (lit(K1) + ctd + 0.5))
        case "plus" =>
          scoredBase
            .withColumn("idf", log((col("n_docs") + 1.0) / col("dfreq")))
            .withColumn("tscore",
              col("idf") * (lit(1.0) + col("tf") * (K1 + 1.0) / (dlNorm * K1 + col("tf"))))
      }
      val perTerm = QueryTerms.map(t =>
        coalesce(max(when(col("tok") === t, col("tscore"))), lit(0.0)))
      val total = perTerm.reduceLeft(_ + _)
      scored.groupBy("doc_id").agg(total.as("score"))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id"))))
        .filter(col("rk") <= 20)
        .select(col("doc_id"), col("rk").cast("long").as("rk"),
          round(col("score"), 9).as("score"))
        .orderBy("rk")
    },
    Some {
      val tscoreSql = variant match {
        case "l" =>
          s"ln((n_docs + 1.0) / (dfreq + 0.5)) * ${K1 + 1.0} * " +
            s"((tf / ((1.0 - $B) + $B * (CAST(dl AS DOUBLE) / avgdl))) + 0.5) / " +
            s"($K1 + (tf / ((1.0 - $B) + $B * (CAST(dl AS DOUBLE) / avgdl))) + 0.5)"
        case "plus" =>
          s"ln((n_docs + 1.0) / dfreq) * " +
            s"(1.0 + tf * ${K1 + 1.0} / " +
            s"(((1.0 - $B) + $B * (CAST(dl AS DOUBLE) / avgdl)) * $K1 + tf))"
      }
      val perTerm = QueryTerms.map(t =>
        s"coalesce(max(CASE WHEN tok = '$t' THEN tscore END), 0.0)").mkString(" + ")
      s"""WITH toks AS (
        |  SELECT doc_id, unnest(string_split(${Tables.NormSql}, ' ')) AS tok FROM documents
        |), dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |qt AS (SELECT doc_id, tok FROM toks WHERE tok IN ($termList)),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM qt GROUP BY doc_id, tok),
        |dfreq AS (SELECT tok, count(DISTINCT doc_id) AS dfreq FROM qt GROUP BY tok),
        |scored AS (
        |  SELECT tf.doc_id, tf.tok, $tscoreSql AS tscore
        |  FROM tf JOIN dfreq USING (tok) JOIN dl USING (doc_id), stats
        |), byDoc AS (SELECT doc_id, $perTerm AS score FROM scored GROUP BY doc_id),
        |ranked AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rk, score FROM byDoc)
        |SELECT doc_id, rk, round(score, 9) AS score FROM ranked WHERE rk <= 20 ORDER BY rk""".stripMargin
    })

  val bm25L: QueryDef = bm25Variant("q_bm25l", "l")
  val bm25Plus: QueryDef = bm25Variant("q_bm25plus", "plus")

  /** Weighted, configurable-c RRF (reference ensemble_similarity.py:33-42,
    * 130-170 takes per-retriever weights and c): same two rankers as
    * q_rrf_fusion, weights 0.7/0.3, c=30. */
  val rrfWeighted = QueryDef(
    "q_rrf_weighted",
    (spark, dir) => {
      val norm = Tables.normText(col("text"))
      val toks = split(norm, " ")
      val overlap = size(array_intersect(array_distinct(toks),
        array(QueryTerms.map(lit): _*)))
      val base = Tables.documents(spark, dir)
        .select(col("doc_id"), size(toks).as("n_tokens"), overlap.as("overlap"))
        .filter(col("overlap") >= 1)
      val (w1, w2, c) = (0.7, 0.3, 30)
      val ranked = base
        .withColumn("r1", row_number().over(
          Window.orderBy(col("n_tokens").desc, col("doc_id"))))
        .withColumn("r2", row_number().over(
          Window.orderBy(col("overlap").desc, col("doc_id"))))
        .withColumn("rrf",
          lit(w1) / (lit(c) + col("r1")) + lit(w2) / (lit(c) + col("r2")))
      ranked
        .withColumn("rk", row_number().over(
          Window.orderBy(col("rrf").desc, col("doc_id"))))
        .filter(col("rk") <= 20)
        .select(col("doc_id"), col("r1").cast("long").as("r1"),
          col("r2").cast("long").as("r2"), round(col("rrf"), 9).as("rrf"))
        .orderBy("doc_id")
    },
    Some(s"""WITH n AS (
      |  SELECT doc_id, string_split(${Tables.NormSql}, ' ') AS toks FROM documents
      |), base AS (
      |  SELECT doc_id, len(toks) AS n_tokens,
      |         len(list_filter(list_distinct(toks), t -> t IN ($termList))) AS ov
      |  FROM n
      |), f AS (SELECT * FROM base WHERE ov >= 1),
      |ranked AS (
      |  SELECT doc_id,
      |         row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS r1,
      |         row_number() OVER (ORDER BY ov DESC, doc_id) AS r2
      |  FROM f
      |), rrf AS (
      |  SELECT doc_id, r1, r2, 0.7 / (30 + r1) + 0.3 / (30 + r2) AS rrf FROM ranked
      |), top AS (
      |  SELECT doc_id, r1, r2, rrf, row_number() OVER (ORDER BY rrf DESC, doc_id) AS rk FROM rrf
      |)
      |SELECT doc_id, r1, r2, round(rrf, 9) AS rrf FROM top WHERE rk <= 20 ORDER BY doc_id""".stripMargin))

  /** RRF fusion of two deterministic rankers over docs containing >=1 query
    * term: r1 = token count desc, r2 = query-term overlap desc. */
  val rrfFusion = QueryDef(
    "q_rrf_fusion",
    (spark, dir) => {
      val norm = Tables.normText(col("text"))
      val toks = split(norm, " ")
      val overlap = size(array_intersect(array_distinct(toks),
        array(QueryTerms.map(lit): _*)))
      val base = Tables.documents(spark, dir)
        .select(col("doc_id"), size(toks).as("n_tokens"), overlap.as("overlap"))
        .filter(col("overlap") >= 1)
      val ranked = base
        .withColumn("r1", row_number().over(
          Window.orderBy(col("n_tokens").desc, col("doc_id"))))
        .withColumn("r2", row_number().over(
          Window.orderBy(col("overlap").desc, col("doc_id"))))
        .withColumn("rrf",
          lit(1.0) / (lit(RrfC) + col("r1")) + lit(1.0) / (lit(RrfC) + col("r2")))
      ranked
        .withColumn("rk", row_number().over(
          Window.orderBy(col("rrf").desc, col("doc_id"))))
        .filter(col("rk") <= 20)
        .select(col("doc_id"), col("r1").cast("long").as("r1"),
          col("r2").cast("long").as("r2"), col("rrf"))
        .orderBy("doc_id")
    },
    Some(s"""WITH n AS (
      |  SELECT doc_id, string_split(${Tables.NormSql}, ' ') AS toks FROM documents
      |), base AS (
      |  SELECT doc_id, len(toks) AS n_tokens,
      |         len(list_filter(list_distinct(toks), t -> t IN ($termList))) AS ov
      |  FROM n
      |), f AS (SELECT * FROM base WHERE ov >= 1),
      |ranked AS (
      |  SELECT doc_id,
      |         row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS r1,
      |         row_number() OVER (ORDER BY ov DESC, doc_id) AS r2
      |  FROM f
      |), rrf AS (
      |  SELECT doc_id, r1, r2, 1.0 / ($RrfC + r1) + 1.0 / ($RrfC + r2) AS rrf FROM ranked
      |), top AS (
      |  SELECT doc_id, r1, r2, rrf, row_number() OVER (ORDER BY rrf DESC, doc_id) AS rk FROM rrf
      |)
      |SELECT doc_id, r1, r2, rrf FROM top WHERE rk <= 20 ORDER BY doc_id""".stripMargin))

  /** Per-group top-k: 3 longest docs per source. */
  val topkPerSource = QueryDef(
    "q_topk_per_source",
    (spark, dir) =>
      Tables.documents(spark, dir)
        .withColumn("rk", row_number().over(
          Window.partitionBy("source").orderBy(col("n_chars").desc, col("doc_id"))))
        .filter(col("rk") <= 3)
        .select(col("source"), col("doc_id"), col("rk").cast("long").as("rk"))
        .orderBy("source", "rk"),
    Some("""WITH r AS (
      |  SELECT source, doc_id,
      |         row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rk
      |  FROM documents
      |)
      |SELECT source, doc_id, rk FROM r WHERE rk <= 3 ORDER BY source, rk""".stripMargin))

  val all: Seq[QueryDef] =
    Seq(bm25, bm25L, bm25Plus, rrfFusion, rrfWeighted, topkPerSource)
}
