package graft

import graft.config.DedupConfig
import graft.pipeline.DedupPipeline
import graft.queries._
import graft.sources.{ClipCorpus, CorpusConfig}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` covers the operator inventory of SURVEY.md §2 over the driver's
  * parquet tables (documents / embeddings / events), each paired with exact
  * DuckDB SQL in `oracleSql`; the clip_* entries run the flagship audio
  * dedup pipeline on the synthesized corpus (ScalaTest-verified, rows-only
  * here — PCM decode and LSH are not DuckDB-expressible). */
object SparkEntry {

  /** Flagship: full audio+transcript dedup pipeline on a small synthesized
    * corpus; returns the cluster table (driver smoke-checks rows > 0). */
  def entry(spark: SparkSession): DataFrame = {
    val clips = ClipCorpus.clips(spark, CorpusConfig(seed = 42L, n = 500L)).toDF()
    DedupPipeline.run(spark, clips, DedupConfig.default)
      .clusters
      .select(col("node").as("clip_id"), col("component"), col("clusterSize"))
  }

  val allQueries: Seq[QueryDef] =
    TextAnalytics.all ++ TextDedup.all ++ Retrieval.all ++ RetrievalEval.all ++
      EmbeddingQueries.all ++ EventQueries.all ++ SimilarityFunctions.all ++
      ClipQueries.all

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
