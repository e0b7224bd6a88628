package graft

import graft.config.DedupConfig
import graft.pipeline.{DedupPipeline, DedupStore, IncrementalDedup}
import graft.sources.{Clip, ClipCorpus, CorpusConfig}
import graft.streaming.StreamingMerge
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Structured Streaming ingest: a stream of clip micro-batches merged via
  * foreachBatch + MERGE must land on the same clusters as a full rebuild. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  val cfg = DedupConfig.default
  val cc = CorpusConfig(seed = 42L, n = 300L)

  private def partition(assign: DataFrame): Set[Seq[String]] =
    assign.groupBy("component").agg(collect_list("clip_id").as("m"))
      .collect().map(_.getSeq[String](1).sorted.toSeq).filter(_.size > 1).toSet

  test("streamed micro-batches == full rebuild (foreachBatch + MERGE)") {
    implicit val sqlCtx = spark.sqlContext
    val store = new DedupStore(
      java.nio.file.Files.createTempDirectory("graft-stream").toString)
    // seed the store with the first 100 clips, stream the remaining 200
    IncrementalDedup.initialize(spark,
      (0L until 100L).map(i => ClipCorpus.genClip(cc, i)).toDF(), cfg, store)

    val source = MemoryStream[Clip]
    val q = StreamingMerge.attach(source.toDF(), store, cfg,
      java.nio.file.Files.createTempDirectory("graft-stream-ckpt").toString)
    source.addData((100L until 200L).map(i => ClipCorpus.genClip(cc, i)))
    q.processAllAvailable()
    source.addData((200L until 300L).map(i => ClipCorpus.genClip(cc, i)))
    q.processAllAvailable()
    q.stop()

    val streamed = partition(store.clusters.read(spark))
    val full = DedupPipeline.run(spark,
      (0L until 300L).map(i => ClipCorpus.genClip(cc, i)).toDF(), cfg)
    val rebuilt = partition(full.clusters.select(col("node").as("clip_id"), col("component")))
    assert(streamed == rebuilt,
      s"streamed ${streamed.size} clusters != rebuilt ${rebuilt.size}")
    assert(store.signatures.read(spark).count() == 300)
    full.signatures.unpersist(); full.dupPairs.unpersist()
  }

  test("stateful streaming sessionization == batch inactivity-gap sessionize") {
    import graft.streaming.{Ev, StreamingEvents}
    implicit val sqlCtx = spark.sqlContext
    val gap = 1800L
    // deterministic event stream: 5 users, gaps straddling the threshold
    val rng = new ClipCorpus.Rng(21L)
    val base = 1700000000000000L // micros
    val evs = (0 until 400).map { i =>
      val user = rng.nextInt(5).toLong
      Ev(user, i.toLong, base + i.toLong * 300000000L + rng.nextInt(1000000))
    }
    val source = MemoryStream[Ev]
    val out = StreamingEvents.sessionCounts(source.toDS(), gap)
    val q = out.writeStream.outputMode("update").format("memory")
      .queryName("sessions_out").start()
    // two event-time-ordered micro-batches
    source.addData(evs.take(200))
    q.processAllAvailable()
    source.addData(evs.drop(200))
    q.processAllAvailable()
    q.stop()
    // latest update per user
    val streamed = spark.table("sessions_out")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("n_events").desc)))
      .filter(col("rn") === 1)
      .select("user_id", "n_events", "n_sessions")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // batch oracle: same inactivity-gap fold per user
    val batch = evs.groupBy(_.user_id).map { case (u, es) =>
      val sorted = es.sortBy(e => (e.tsMicros, e.event_id))
      var last = Long.MinValue; var s = 0L
      sorted.foreach { e =>
        if (last == Long.MinValue || e.tsMicros - last > gap * 1000000L) s += 1
        last = e.tsMicros
      }
      u -> (sorted.size.toLong, s)
    }
    assert(streamed == batch, s"streamed $streamed != batch $batch")
    assert(batch.values.exists(_._2 > 1), "fixture sanity: multi-session users")
  }

  test("watermarked windowed counts: late rows beyond the watermark are dropped") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(java.sql.Timestamp, String)]
    val events = source.toDF().toDF("ts", "event_type")
    val out = graft.streaming.StreamingEvents.windowedCounts(
      events, watermark = "10 minutes", win = "1 hour")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("win_out").start()
    def ts(minute: Int) = new java.sql.Timestamp(3600000L * 500 + minute * 60000L)
    // hour 1: two events; then advance far past it (watermark closes hour 1)
    source.addData((ts(5), "click"), (ts(20), "click"))
    q.processAllAvailable()
    source.addData((ts(200), "click"))
    q.processAllAvailable()
    // a late row for hour 1, far behind the watermark: must be DROPPED
    source.addData((ts(6), "click"))
    q.processAllAvailable()
    source.addData((ts(400), "click"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("win_out")
      .select(col("win_start").cast("long"), col("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(3600L * 500) == 2L,
      s"hour-1 window must close at 2 events (late row dropped): $rows")
  }
}
