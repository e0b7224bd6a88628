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
}
