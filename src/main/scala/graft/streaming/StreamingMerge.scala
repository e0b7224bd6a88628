package graft.streaming

import graft.config.DedupConfig
import graft.pipeline.{DedupStore, IncrementalDedup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * Structured Streaming front door for the incremental index: a clip stream
 * is merged into the dedup store one micro-batch at a time via
 * foreachBatch + MERGE — the upgrade path SURVEY.md §2.10 names for the
 * reference's batch-diff incremental loop (improved_faiss_detector.py:673-693
 * --mode update; async REST build faiss_service_ui.py:290-349). The
 * reference has no event-time/watermark semantics to preserve, so each
 * micro-batch is an ordinary MERGE: new clips dedup against the existing
 * corpus without full recompute, and the LakeTable snapshot per batch gives
 * exactly-once-on-replay (a re-run of the same batch is a no-op merge —
 * IncrementalSpec's idempotence property).
 */
object StreamingMerge {

  /**
   * Attach a streaming clip source (schema = input_hint columns) to a store.
   * Caller controls the trigger; ProcessingTime(0) drains as fast as merges
   * complete.
   */
  def attach(clipStream: DataFrame, store: DedupStore, cfg: DedupConfig,
             checkpointDir: String,
             trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery =
    clipStream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          IncrementalDedup.merge(batch.sparkSession, batch, cfg, store)
      }
      .start()
}
