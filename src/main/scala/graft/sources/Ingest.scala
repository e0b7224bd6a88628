package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Ingestion/export entry points beyond parquet — the reference's chunked
 * CSV/TSV corpus readers (faiss_bert_similarity.py:50-63,
 * faiss_clip_similarity.py:92-105, pd.read_csv chunksize=10000 with column
 * projection) and JSONL corpus/result dumps (bert_similarity.py:222-251,
 * faiss_bert_similarity.py:221-233).
 *
 * Chunking is free in Spark (file splits/partitions replace the reference's
 * chunksize loop); column projection is a pushed-down `select`. Audio bytes
 * cross text formats as base64 (`bytes_b64`), decoded with the codegen'd
 * `unbase64` — binary never round-trips through CSV/JSON raw.
 */
object Ingest {

  /** Text-format clip schema: bytes travel base64-encoded. */
  val ClipTextSchema: StructType = StructType(Seq(
    StructField("clip_id", StringType, nullable = false),
    StructField("bytes_b64", StringType, nullable = true),
    StructField("sr_hz", IntegerType, nullable = true),
    StructField("dur_ms", IntegerType, nullable = true),
    StructField("codec", StringType, nullable = true),
    StructField("transcript", StringType, nullable = true)))

  private def decodeClips(df: DataFrame): DataFrame =
    df.select(
      col("clip_id"),
      unbase64(col("bytes_b64")).as("bytes"),
      col("sr_hz").cast("int").as("sr_hz"),
      col("dur_ms").cast("int").as("dur_ms"),
      col("codec"),
      coalesce(col("transcript"), lit("")).as("transcript"))

  /** CSV/TSV clip source (S2). `sep` "\t" for TSV; header required.
    * multiLine: base64 encoders (including Spark's MIME-chunked one) may wrap
    * at 76 chars, putting newlines inside the quoted bytes_b64 field. */
  def clipsFromCsv(spark: SparkSession, path: String, sep: String = ","): DataFrame =
    decodeClips(spark.read
      .option("header", "true").option("sep", sep)
      .option("multiLine", "true")
      .schema(ClipTextSchema)
      .csv(path))

  /** JSONL clip source (S7): one {clip_id, bytes_b64, sr_hz, ...} per line. */
  def clipsFromJsonl(spark: SparkSession, path: String): DataFrame =
    decodeClips(spark.read.schema(ClipTextSchema).json(path))

  /** JSONL clip dump — the inverse of clipsFromJsonl (round-trip pinned by
    * IngestSpec). */
  def clipsToJsonl(clips: DataFrame, path: String): Unit =
    clips.select(
      col("clip_id"),
      base64(col("bytes")).as("bytes_b64"),
      col("sr_hz"), col("dur_ms"), col("codec"), col("transcript"))
      .write.mode("overwrite").json(path)

  /** JSONL result sink (S8): any result table (pairs, clusters, search hits)
    * as one JSON object per line. */
  def resultsToJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Generic projected CSV read (the reference's `usecols` projection —
    * column pruning reaches the scan). */
  def csv(spark: SparkSession, path: String, columns: Seq[String],
          sep: String = ","): DataFrame = {
    val base = spark.read.option("header", "true").option("sep", sep)
      .option("inferSchema", "true").csv(path)
    base.select(columns.map(col): _*)
  }
}
