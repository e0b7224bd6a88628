package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed event row for the stateful operators (events-table shape). */
final case class Ev(user_id: Long, event_id: Long, tsMicros: Long)

/** Running per-user session count emitted by the stateful sessionizer. */
final case class UserSessions(user_id: Long, n_events: Long, n_sessions: Long)

/**
 * Event-time Structured Streaming operators over the events stream — the
 * streaming forms of the batch EventQueries plans, per SURVEY §2.10:
 * watermarked tumbling-window aggregation (late data beyond the watermark
 * dropped, state bounded) and custom sessionization state via
 * flatMapGroupsWithState (KeyValueGroupedDataset — the engine's slot for
 * reference-style incremental loops that need per-key state).
 */
object StreamingEvents {

  /** Watermarked tumbling-window counts per event_type: state for a window
    * is dropped once the watermark passes its end — bounded state at any
    * stream length. `events` must carry an event-time `ts` timestamp. */
  def windowedCounts(events: DataFrame, watermark: String = "30 minutes",
                     win: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), win), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))

  /**
   * Stateful sessionization: per-user (last event time, session count) state,
   * a new session when the gap exceeds `gapSec` — the same inactivity-gap
   * semantics as the batch q_event_sessions (EventQueries.sessionize), which
   * StreamingSpec pins. Events within one batch are sorted by (ts, event_id)
   * before folding; the caller feeds batches in event-time order (a
   * watermark upstream enforces this in production).
   */
  def sessionCounts(events: Dataset[Ev], gapSec: Long): Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    val gapMicros = gapSec * 1000000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (user: Long, it: Iterator[Ev], state: GroupState[(Long, Long, Long)]) => {
          // state = (lastTsMicros, nEvents, nSessions)
          var (lastTs, nEv, nSess) =
            state.getOption.getOrElse((Long.MinValue, 0L, 0L))
          it.toSeq.sortBy(e => (e.tsMicros, e.event_id)).foreach { e =>
            if (lastTs == Long.MinValue || e.tsMicros - lastTs > gapMicros)
              nSess += 1
            nEv += 1
            lastTs = e.tsMicros
          }
          state.update((lastTs, nEv, nSess))
          Iterator(UserSessions(user, nEv, nSess))
        })
  }
}
