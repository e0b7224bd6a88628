package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-stream batch analytics over the `events` table: sessionization by
 * inactivity gap (lag + cumulative flag sum — the standard Spark window
 * idiom) and exact event dedup. The reference has no true streaming
 * (SURVEY.md §2.10); these are the batch forms its incremental loop needs,
 * and the same plans run under Structured Streaming with a watermark.
 */
object EventQueries {
  val GapSeconds = 1800L

  val sessionize = QueryDef(
    "q_event_sessions",
    (spark, dir) => {
      val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(spark, dir)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        // microsecond-exact gap test (unix_timestamp truncates to seconds,
        // which can disagree with a fractional-second oracle at the boundary).
        // cast: some sf dirs carry TIMESTAMP_NTZ — session tz is UTC, so the
        // cast matches DuckDB's naive epoch_us exactly.
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts").cast("timestamp")) -
              unix_micros(col("prev_ts").cast("timestamp")) > GapSeconds * 1000000L, 1L)
            .otherwise(0L))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), sum(col("new_sess")).as("n_sessions"))
        .orderBy("user_id")
    },
    Some(s"""WITH w AS (
      |  SELECT user_id, ts,
      |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events
      |), f AS (
      |  SELECT user_id,
      |         CASE WHEN prev_ts IS NULL
      |                OR epoch_us(ts) - epoch_us(prev_ts) > ${GapSeconds}000000 THEN 1 ELSE 0 END AS new_sess
      |  FROM w
      |)
      |SELECT user_id, count(*) AS n_events, CAST(sum(new_sess) AS BIGINT) AS n_sessions
      |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin))

  /** Exact event dedup on (user_id, event_type, ts): keep min event_id. */
  val eventDedup = QueryDef(
    "q_event_dedup",
    (spark, dir) =>
      Tables.events(spark, dir)
        .groupBy("user_id", "event_type", "ts")
        .agg(min(col("event_id")).as("keep_id"), count(lit(1)).as("n"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_unique"), sum(col("n")).as("n_total"))
        .orderBy("user_id"),
    Some("""WITH g AS (
      |  SELECT user_id, event_type, ts, min(event_id) AS keep_id, count(*) AS n
      |  FROM events GROUP BY user_id, event_type, ts
      |)
      |SELECT user_id, count(*) AS n_unique, CAST(sum(n) AS BIGINT) AS n_total
      |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin))

  val all: Seq[QueryDef] = Seq(sessionize, eventDedup)
}
