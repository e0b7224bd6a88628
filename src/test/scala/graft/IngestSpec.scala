package graft

import graft.sources.{ClipCorpus, CorpusConfig, Ingest}
import org.apache.spark.sql.functions._

/** CSV/TSV/JSONL ingestion round-trips (reference S2/S7/S8): bytes survive
  * base64 transit exactly and the ingested frame drives the signature pass. */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private lazy val clips = {
    val conf = CorpusConfig(seed = 42L, n = 30L)
    spark.range(0, conf.n, 1, 2)
      .mapPartitions(_.map(i => ClipCorpus.genClip(conf, i))).toDF()
  }

  test("JSONL dump -> JSONL source round-trips clips exactly") {
    val dir = tmp("graft-jsonl") + "/clips"
    Ingest.clipsToJsonl(clips, dir)
    val back = Ingest.clipsFromJsonl(spark, dir)
    assert(back.count() == 30)
    val mismatch = clips.as("x").join(back.as("y"), "clip_id")
      .filter($"x.bytes" =!= $"y.bytes" || $"x.transcript" =!= $"y.transcript" ||
        $"x.sr_hz" =!= $"y.sr_hz" || $"x.dur_ms" =!= $"y.dur_ms" ||
        $"x.codec" =!= $"y.codec")
      .count()
    assert(mismatch == 0, s"$mismatch rows corrupted in JSONL transit")
  }

  test("CSV and TSV sources parse the text clip schema with base64 bytes") {
    Seq(("," , tmp("graft-csv") + "/clips.csv"),
        ("\t", tmp("graft-tsv") + "/clips.tsv")).foreach { case (sep, path) =>
      clips.select(col("clip_id"), base64(col("bytes")).as("bytes_b64"),
        col("sr_hz"), col("dur_ms"), col("codec"), col("transcript"))
        .coalesce(1)
        .write.option("header", "true").option("sep", sep).csv(path)
      val back = Ingest.clipsFromCsv(spark, path, sep)
      assert(back.count() == 30)
      val mismatch = clips.as("x").join(back.as("y"), "clip_id")
        .filter($"x.bytes" =!= $"y.bytes" || $"x.transcript" =!= $"y.transcript")
        .count()
      assert(mismatch == 0, s"sep='$sep': $mismatch rows corrupted")
    }
  }

  test("ingested clips drive the signature pass (pipeline-compatible)") {
    val dir = tmp("graft-jsonl2") + "/clips"
    Ingest.clipsToJsonl(clips, dir)
    val back = Ingest.clipsFromJsonl(spark, dir)
    val sigs = graft.pipeline.DedupPipeline.signatures(
      spark, back, graft.config.DedupConfig.default)
    assert(sigs.filter(col("tsig").isNotNull && col("asig").isNotNull).count() == 30)
  }

  test("projected CSV read prunes to the requested columns") {
    val path = tmp("graft-proj") + "/docs.csv"
    Seq(("d1", "hello world", 11L), ("d2", "spark join", 10L))
      .toDF("doc_id", "text", "n_chars")
      .write.option("header", "true").csv(path)
    val got = Ingest.csv(spark, path, Seq("doc_id", "n_chars"))
    assert(got.columns.toSeq == Seq("doc_id", "n_chars"))
    assert(got.count() == 2)
  }
}
