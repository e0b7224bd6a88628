package graft.pipeline

import graft.config.DedupConfig
import graft.functions.{AudioPcm, SimHash, TextShingles}
import graft.operators.{ConnectedComponents, ContainmentJoin, LshCandidates, MinHasher, PairVerifier}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One row per pipeline stage, written alongside outputs (the north rule's
  * per-partition lineage + metrics; analog of the reference's metadata
  * counters, improved_faiss_detector.py:399-405). */
final case class StageMetric(stage: String, metric: String, value: Long)

final case class PipelineResult(
    signatures: DataFrame,   // clip_id, sha, tshingles, ashingles, tsig, asig, simhash
    dupPairs: DataFrame,     // a, b, score, method
    clusters: DataFrame,     // node, component, clusterSize
    metrics: Seq[StageMetric])

/**
 * The full near-duplicate pipeline over a clips table (BASELINE.json
 * north_star): signature extraction -> LSH candidates (text + audio) ->
 * exact verify -> containment pass -> connected components.
 *
 * Every stage is a declarative DataFrame plan; shuffles happen exactly at:
 *  (1) the MinHash groupBy(clip_id)            — signature build
 *  (2) the band-key groupBy/self-join          — candidate generation
 *  (3) the verify joins back to signatures     — exact re-score
 *  (4) CC label-propagation rounds             — clustering
 * The signatures DataFrame is cached across (2)/(3) so the corpus is scanned
 * once.
 */
object DedupPipeline {

  /** Per-clip feature/signature extraction — a single pass, no shuffle except
    * the MinHash minima aggregations. */
  def signatures(spark: SparkSession, clips: DataFrame, cfg: DedupConfig): DataFrame = {
    val tsh = TextShingles.hashShingles(
      TextShingles.charShingles(lower(col("transcript")), cfg.charGramK), portable = false)
    val base = clips.select(
      col("clip_id"),
      sha2(col("bytes"), 256).as("sha"),
      xxhash64(col("transcript")).as("tHashExact"),
      tsh.as("tshingles"),
      AudioPcm.audioShingles(spark, col("bytes"), col("sr_hz"),
        cfg.frameMs, cfg.hopMs, cfg.framesPerShingle, cfg.energyLevels).as("ashingles"),
      SimHash.simhash(spark, col("transcript")).as("simhash"),
      col("transcript"))

    val tSigs = MinHasher.signatures(base, "clip_id", "tshingles", cfg.numPerms, cfg.seed)
      .withColumnRenamed("sig", "tsig")
    val aSigs = MinHasher.signatures(base, "clip_id", "ashingles", cfg.numPerms, cfg.seed + 1)
      .withColumnRenamed("sig", "asig")
    base.join(tSigs, Seq("clip_id"), "left").join(aSigs, Seq("clip_id"), "left")
  }

  def run(spark: SparkSession, clips: DataFrame, cfg: DedupConfig = DedupConfig.default): PipelineResult = {
    val metrics = scala.collection.mutable.ArrayBuffer[StageMetric]()
    val sigs = signatures(spark, clips, cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    metrics += StageMetric("signatures", "rows", sigs.count())

    // (a) exact dups: identical content hash (audio) or identical transcript.
    //     groupBy + adjacent pairing would lose transitivity info; emit
    //     star edges to the min id per group (linear, CC closes the group).
    val exactEdges = {
      val bySha = sigs.select(col("clip_id"), col("sha").as("k"))
      val byTxt = sigs.filter(length(col("transcript")) > 0)
        .select(col("clip_id"), col("tHashExact").cast("string").as("k"))
      Seq(bySha, byTxt).map { g =>
        val heads = g.groupBy("k").agg(min("clip_id").as("a"), count(lit(1)).as("n"))
          .filter(col("n") > 1)
        g.join(heads, "k").filter(col("clip_id") =!= col("a"))
          .select(col("a"), col("clip_id").as("b"), lit(1.0).as("score"),
            lit("exact").as("method"))
      }.reduce(_ union _).dropDuplicates("a", "b")
    }

    // (b) text LSH candidates -> exact jaccard verify
    val tSigOnly = sigs.filter(col("tsig").isNotNull).select(col("clip_id"), col("tsig").as("sig"))
    val (tCands, tDropped) = LshCandidates.candidatePairs(tSigOnly, "clip_id", cfg)
    val textPairs = PairVerifier.verify(tCands, sigs, "clip_id", "tshingles",
      cfg.textJaccardThreshold, "text_minhash")

    // (c) audio LSH candidates (wider bands for the noisier sketch) ->
    //     jaccard floor -> exact PCM-correlation confirm
    val aSigOnly = sigs.filter(col("asig").isNotNull).select(col("clip_id"), col("asig").as("sig"))
    val (aCands, aDropped) = LshCandidates.candidatePairs(
      aSigOnly, "clip_id", cfg.audioBands, cfg.audioRowsPerBand, cfg.maxBucketSize)
    val audioScreened = PairVerifier.verify(aCands, sigs, "clip_id", "ashingles",
      cfg.audioJaccardThreshold, "audio_minhash")
    val audioPairs = PairVerifier.pcmConfirm(audioScreened, clips, "clip_id", cfg.pcmCorrMin)

    // (d) containment: long verbatim transcript runs (>= cfg.containmentMinRun)
    val containPairs = ContainmentJoin.pairs(
      sigs.select(col("clip_id"), col("transcript")), "clip_id", "transcript", cfg)
      .select(col("a"), col("b"), lit(0.9).as("score"), lit("containment").as("method"))

    val dupPairs = exactEdges
      .unionByName(textPairs).unionByName(audioPairs).unionByName(containPairs)
      .dropDuplicates("a", "b")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    metrics += StageMetric("candidates_text_dropped_buckets", "rows", tDropped.count())
    metrics += StageMetric("candidates_audio_dropped_buckets", "rows", aDropped.count())
    metrics += StageMetric("dup_pairs", "rows", dupPairs.count())

    val clusters = ConnectedComponents.clusters(dupPairs, cfg.minClusterSize)
    PipelineResult(sigs, dupPairs, clusters, metrics.toSeq)
  }
}
