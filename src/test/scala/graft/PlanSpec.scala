package graft

/** Plan-hygiene pins: the parquet scans under the driver-contract queries
  * must stay column-pruned (never reading a blob column the query doesn't
  * use) and keep their pushable filters pushed. These are the properties
  * that make the same plans viable at 100 TB — a scan that reads `text` for
  * a length-only aggregate is wrong long before it is slow. */
class PlanSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  private def formatted(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)

  private def readSchemas(plan: String): Seq[String] =
    "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(plan).map(_.group(1)).toSeq

  test("q_topk_per_source never reads the text blob (length-only aggregate)") {
    val schemas = readSchemas(formatted("q_topk_per_source"))
    assert(schemas.nonEmpty)
    schemas.foreach(s => assert(!s.contains("text"), s"text column read: $s"))
  }

  test("q_token_stats prunes the documents scan to (doc_id, text)") {
    val schemas = readSchemas(formatted("q_token_stats"))
    assert(schemas.nonEmpty)
    schemas.foreach { s =>
      assert(!s.contains("lang") && !s.contains("source") && !s.contains("n_chars"),
        s"unpruned column in: $s")
    }
  }

  test("embedding queries prune the label column and push the id filter") {
    Seq("q_cosine_topk", "q_ann_ivf").foreach { q =>
      val plan = formatted(q)
      readSchemas(plan).foreach(s =>
        assert(!s.contains("label"), s"$q reads label: $s"))
      assert(plan.contains("PushedFilters: ["), s"$q lost filter pushdown")
    }
  }
}
