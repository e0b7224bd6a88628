package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Retrieval evaluation operators — NDCG@k, MAP, Recall@k, Precision@k, MRR —
 * the metric set the reference computes via pytrec_eval
 * (similarities/similarities/evaluation.py:10-171) and uses to grade its
 * BM25/SBERT benchmarks (benchmark_bm25.py:85-110). Re-expressed as one
 * declarative plan over (run, qrels) relations, so grading a ranker is a
 * join, not a driver loop.
 *
 * Float determinism (oracle bit-exactness): every per-rank float sum (DCG,
 * AP) is built as k fixed-order conditional additions — never a float SUM
 * over a group, whose addition order depends on partitioning (same trick as
 * Retrieval.bm25). Outputs are rounded to 9 decimals; upstream of the
 * rounding everything is int arithmetic, IEEE division, or libm log2 whose
 * final ULP the rounding absorbs.
 */
object RetrievalEval {

  /**
   * Grade a run against qrels.
   * @param run   (qid, doc_id, rank) — rank 1-based, unique per qid
   * @param qrels (qid, doc_id, rel)  — graded relevance, rel >= 0
   * @param k     cutoff for all metrics
   * @return (qid, n_rel, ndcg, ap, recall, prec, mrr, recall_cap, acc,
   *         hole) per qid; MAP uses the standard AP denominator = total
   *         relevant (not capped at k). The last three mirror the
   *         reference's custom metrics (evaluation.py:60-122): capped
   *         recall hits/min(n_rel, k), top-k accuracy (any relevant doc in
   *         the top k), and hole@k (fraction of top-k docs absent from the
   *         annotated corpus entirely).
   */
  def evaluate(run: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    val rel = qrels.filter(col("rel") > 0)
    val nRel = rel.groupBy("qid").agg(count(lit(1)).as("n_rel"))
    // hole@k's "annotated corpus": every doc with ANY qrels row, any query
    // (evaluation.py:74-77)
    val annotated = qrels.select(col("doc_id")).distinct()
      .withColumn("_ann", lit(1))

    def fixedSum(rankCol: String, term: Column): Column =
      (1 to k).map(i => coalesce(max(when(col(rankCol) === i, term)), lit(0.0)))
        .reduceLeft(_ + _)
    def gainAt(relCol: Column, rankCol: Column): Column =
      (pow(lit(2.0), relCol) - 1.0) / log2(rankCol + 1.0)

    val joined = run.filter(col("rank") <= k)
      .join(qrels.select(col("qid"), col("doc_id"), col("rel")),
        Seq("qid", "doc_id"), "left")
      .join(annotated, Seq("doc_id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0)))
      .withColumn("relflag", (col("rel") > 0).cast("int"))
      .withColumn("holeflag", when(col("_ann").isNull, 1).otherwise(0))
      .withColumn("cum",
        sum("relflag").over(Window.partitionBy("qid").orderBy("rank")))
    val apTerm = when(col("relflag") === 1,
      col("cum").cast("double") / col("rank")).otherwise(lit(0.0))
    val perQ = joined.groupBy("qid").agg(
      fixedSum("rank", gainAt(col("rel"), col("rank"))).as("dcg"),
      fixedSum("rank", apTerm).as("ap_num"),
      sum("relflag").as("hits"),
      sum("holeflag").as("holes"),
      min(when(col("relflag") === 1, col("rank"))).as("first_rel"))

    // ideal DCG: qrels sorted by rel desc (doc_id tie-break), top k
    val ideal = rel
      .withColumn("irank", row_number().over(
        Window.partitionBy("qid").orderBy(col("rel").desc, col("doc_id"))))
      .filter(col("irank") <= k)
      .groupBy("qid")
      .agg(fixedSum("irank", gainAt(col("rel"), col("irank"))).as("idcg"))

    perQ.join(ideal, Seq("qid"), "left").join(nRel, Seq("qid"), "left")
      .select(
        col("qid"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        round(when(col("idcg") > 0, col("dcg") / col("idcg")).otherwise(0.0), 9)
          .as("ndcg"),
        round(when(col("n_rel") > 0, col("ap_num") / col("n_rel")).otherwise(0.0), 9)
          .as("ap"),
        round(when(col("n_rel") > 0, col("hits").cast("double") / col("n_rel"))
          .otherwise(0.0), 9).as("recall"),
        round(col("hits").cast("double") / k, 9).as("prec"),
        round(coalesce(lit(1.0) / col("first_rel"), lit(0.0)), 9).as("mrr"),
        round(when(col("n_rel") > 0,
          col("hits").cast("double") / least(col("n_rel"), lit(k.toLong)))
          .otherwise(0.0), 9).as("recall_cap"),
        when(col("first_rel").isNotNull, 1.0).otherwise(0.0).as("acc"),
        round(col("holes").cast("double") / k, 9).as("hole"))
  }

  // ---- oracle fixture: grade a single-term BM25 run over `documents` ----
  // Queries = Retrieval.QueryTerms; golden qrels are derived from the FIRST
  // HALF of each document (rel = min(2, term count there)) so relevance is
  // correlated with, but not identical to, the full-text ranking — the
  // metrics are non-trivial and fully reproducible in DuckDB.
  val EvalK = 10

  val evalBm25 = QueryDef(
    "q_eval_bm25",
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
      val terms = Retrieval.QueryTerms
      val norm = Tables.normText(col("text"))
      val toks = split(norm, " ")
      val halfToks = split(Tables.normText(
        col("text").substr(lit(1), floor(length(col("text")) / 2).cast("int"))), " ")
      val base = docs.select(col("doc_id"),
        explode(array(terms.map(lit): _*)).as("qid"),
        toks.as("toks"), size(toks).as("dl"), halfToks.as("htoks"))
        .withColumn("tf", size(filter(col("toks"), t => t === col("qid"))))
        .withColumn("rel", least(lit(2),
          size(filter(col("htoks"), t => t === col("qid")))))
      val cached = base.select("qid", "doc_id", "dl", "tf", "rel")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val stats = cached.filter(col("qid") === terms.head)
        .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
      val dfreq = cached.filter(col("tf") > 0)
        .groupBy("qid").agg(count(lit(1)).as("dfreq"))
      val scored = cached.filter(col("tf") > 0)
        .join(dfreq, "qid").crossJoin(broadcast(stats))
        .withColumn("idf",
          log((col("n_docs") - col("dfreq") + 0.5) / (col("dfreq") + 0.5) + 1.0))
        .withColumn("score", round(
          col("idf") * (col("tf") * (Retrieval.K1 + 1.0) /
            (col("tf") + ((col("dl").cast("double") / col("avgdl")) * Retrieval.B
              + (1.0 - Retrieval.B)) * Retrieval.K1)), 9))
      val run = scored
        .withColumn("rank", row_number().over(
          Window.partitionBy("qid").orderBy(col("score").desc, col("doc_id"))))
        .filter(col("rank") <= EvalK)
        .select("qid", "doc_id", "rank")
      val qrels = cached.select("qid", "doc_id", "rel").filter(col("rel") > 0)
      evaluate(run, qrels, EvalK).orderBy("qid")
    },
    Some {
      val terms = Retrieval.QueryTerms
      val termVals = terms.map(t => s"('$t')").mkString(", ")
      val k = EvalK
      def fixedSumSql(rankCol: String, term: String): String =
        (1 to k).map(i =>
          s"coalesce(max(CASE WHEN $rankCol = $i THEN $term END), 0.0)")
          .mkString(" + ")
      val gain = s"(pow(2.0, rel) - 1.0) / log2(rank + 1.0)"
      val igain = s"(pow(2.0, rel) - 1.0) / log2(irank + 1.0)"
      s"""WITH terms(qid) AS (VALUES $termVals),
        |n AS (SELECT doc_id, ${Tables.NormSql} AS t,
        |             ${Tables.normSqlOf("substr(text, 1, length(text) // 2)")} AS h
        |      FROM documents),
        |base AS (
        |  SELECT doc_id, qid,
        |         len(list_filter(string_split(t, ' '), x -> x = qid)) AS tf,
        |         len(string_split(t, ' ')) AS dl,
        |         least(2, len(list_filter(string_split(h, ' '), x -> x = qid))) AS rel
        |  FROM n CROSS JOIN terms
        |),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl
        |          FROM base WHERE qid = '${terms.head}'),
        |dfreq AS (SELECT qid, count(*) AS dfreq FROM base WHERE tf > 0 GROUP BY qid),
        |scored AS (
        |  SELECT base.qid, doc_id,
        |         round(ln((n_docs - dfreq + 0.5) / (dfreq + 0.5) + 1.0) *
        |         (tf * ${Retrieval.K1 + 1.0} /
        |          (tf + ((CAST(dl AS DOUBLE) / avgdl) * ${Retrieval.B}
        |                 + ${1.0 - Retrieval.B}) * ${Retrieval.K1})), 9) AS score
        |  FROM base JOIN dfreq ON base.qid = dfreq.qid, stats
        |  WHERE tf > 0
        |),
        |run AS (
        |  SELECT qid, doc_id,
        |         row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
        |  FROM scored
        |),
        |qrels AS (SELECT qid, doc_id, rel FROM base WHERE rel > 0),
        |nrel AS (SELECT qid, count(*) AS n_rel FROM qrels GROUP BY qid),
        |ann AS (SELECT DISTINCT doc_id FROM qrels),
        |j AS (
        |  SELECT run.qid, run.rank,
        |         coalesce(qrels.rel, 0) AS rel,
        |         CASE WHEN coalesce(qrels.rel, 0) > 0 THEN 1 ELSE 0 END AS relflag,
        |         CASE WHEN ann.doc_id IS NULL THEN 1 ELSE 0 END AS holeflag
        |  FROM run LEFT JOIN qrels ON run.qid = qrels.qid AND run.doc_id = qrels.doc_id
        |           LEFT JOIN ann ON run.doc_id = ann.doc_id
        |  WHERE run.rank <= $k
        |),
        |jc AS (
        |  SELECT *, sum(relflag) OVER (PARTITION BY qid ORDER BY rank) AS cum FROM j
        |),
        |perq AS (
        |  SELECT qid,
        |         ${fixedSumSql("rank", gain)} AS dcg,
        |         ${fixedSumSql("rank",
              "CASE WHEN relflag = 1 THEN CAST(cum AS DOUBLE) / rank ELSE 0.0 END")} AS ap_num,
        |         sum(relflag) AS hits,
        |         sum(holeflag) AS holes,
        |         min(CASE WHEN relflag = 1 THEN rank END) AS first_rel
        |  FROM jc GROUP BY qid
        |),
        |ir AS (
        |  SELECT qid, rel,
        |         row_number() OVER (PARTITION BY qid ORDER BY rel DESC, doc_id) AS irank
        |  FROM qrels
        |),
        |ideal AS (
        |  SELECT qid, ${fixedSumSql("irank", igain)} AS idcg
        |  FROM ir WHERE irank <= $k GROUP BY qid
        |)
        |SELECT perq.qid AS qid,
        |       coalesce(n_rel, 0) AS n_rel,
        |       round(CASE WHEN idcg > 0 THEN dcg / idcg ELSE 0.0 END, 9) AS ndcg,
        |       round(CASE WHEN n_rel > 0 THEN ap_num / n_rel ELSE 0.0 END, 9) AS ap,
        |       round(CASE WHEN n_rel > 0 THEN CAST(hits AS DOUBLE) / n_rel ELSE 0.0 END, 9) AS recall,
        |       round(CAST(hits AS DOUBLE) / $k, 9) AS prec,
        |       round(coalesce(1.0 / first_rel, 0.0), 9) AS mrr,
        |       round(CASE WHEN n_rel > 0 THEN CAST(hits AS DOUBLE) / least(n_rel, $k)
        |             ELSE 0.0 END, 9) AS recall_cap,
        |       CASE WHEN first_rel IS NOT NULL THEN 1.0 ELSE 0.0 END AS acc,
        |       round(CAST(holes AS DOUBLE) / $k, 9) AS hole
        |FROM perq LEFT JOIN ideal ON perq.qid = ideal.qid
        |          LEFT JOIN nrel ON perq.qid = nrel.qid
        |ORDER BY qid""".stripMargin
    })

  val all: Seq[QueryDef] = Seq(evalBm25)
}
