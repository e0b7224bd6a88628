package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark plan over the sf-dir parquet tables
  * plus (where SQL-expressible) the ANSI SQL a DuckDB oracle runs on the same
  * tables. Column names MUST match between the two (the driver sorts columns
  * by name before hashing values). */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Shared loaders + SQL fragments used by every query module. */
object Tables {
  def documents(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")
  def events(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/events.parquet")

  /** Normalized text: lowercase, collapsed whitespace, trimmed. */
  val NormSql = """trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"""
  /** Same normalization over an arbitrary SQL expression. */
  def normSqlOf(expr: String): String =
    s"""trim(regexp_replace(lower($expr), '\\s+', ' ', 'g'))"""

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._
  def normText(c: Column): Column = trim(regexp_replace(lower(c), "\\s+", " "))
}
