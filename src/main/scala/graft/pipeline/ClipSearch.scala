package graft.pipeline

import graft.config.DedupConfig
import graft.operators.{LshCandidates, PairVerifier}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Read-only query-by-example search over a committed DedupStore — the analog
 * of the reference's headline interaction `search_similar_images(target, k,
 * threshold)` (improved_faiss_detector.py:522-556) and `most_similar`
 * (bert_similarity.py:152-220): probe clips → LSH-band lookup against the
 * STORED signature table → exact verify (text jaccard / audio jaccard + PCM
 * confirm / exact-identity) → per-probe top-k. Never mutates the store (the
 * only way to dedup a new clip before this was a full IncrementalDedup.merge).
 *
 * Plan shape: probe-side signatures are computed once (tiny); candidates are
 * an equi shuffle join on hashed band keys against the stored table pruned to
 * (clip_id, sig) columns; byte-heavy verifies semi-join only candidate ids —
 * the same delta-vs-all shape as the incremental merge, so probe batches of
 * any size scale identically.
 */
object ClipSearch {

  /**
   * @param probes   clips table-shaped rows to search for (clip_id must not
   *                 collide with stored ids — prefix probe ids if needed)
   * @param k        results per probe
   * @param includeDeleted  v3 tombstone semantics: search deleted entries too
   *                 (incremental_faiss_detector.py:566-572)
   * @return (probe_id, match_id, score, method, rank) — rank 1..k per probe,
   *         score desc; exact content/transcript matches score 1.0
   */
  def search(spark: SparkSession, probes: DataFrame, store: DedupStore,
             cfg: DedupConfig = DedupConfig.default, k: Int = 10,
             includeDeleted: Boolean = false): DataFrame = {
    val stored = store.signatures.read(spark)
      .filter(col("is_deleted") === false || lit(includeDeleted))
    val probeSigs = DedupPipeline.signatures(spark, probes, cfg)
      .localCheckpoint(eager = true)

    def bandCands(sigCol: String, bands: Int, rows: Int): DataFrame = {
      val all = LshCandidates.bandKeysHashed(
        stored.filter(col(sigCol).isNotNull)
          .select(col("clip_id"), col(sigCol).as("sig")), "clip_id", bands, rows)
      val p = LshCandidates.bandKeysHashed(
        probeSigs.filter(col(sigCol).isNotNull)
          .select(col("clip_id"), col(sigCol).as("sig")), "clip_id", bands, rows)
      // same hot-band guard as the batch/incremental paths
      val sizes = all.groupBy("band", "bandVal").agg(count(lit(1)).as("n"))
      val kept = all.join(sizes.filter(col("n") <= cfg.maxBucketSize),
        Seq("band", "bandVal"))
      p.select(col("clip_id").as("probe_id"), col("band"), col("bandVal"))
        .join(kept.select(col("clip_id").as("match_id"), col("band"), col("bandVal")),
          Seq("band", "bandVal"))
        .filter(col("probe_id") =!= col("match_id"))
        .select("probe_id", "match_id")
        .dropDuplicates("probe_id", "match_id")
    }
    val jac = udf((x: Array[Long], y: Array[Long]) => PairVerifier.jaccardLongJvm(x, y))
    val est = udf((x: Array[Long], y: Array[Long]) => PairVerifier.estimateJvm(x, y))

    val tScored = bandCands("tsig", cfg.bands, cfg.rowsPerBand)
      .join(probeSigs.select(col("clip_id").as("probe_id"), col("tshingles").as("_sa")), "probe_id")
      .join(stored.select(col("clip_id").as("match_id"), col("tshingles").as("_sb")), "match_id")
      .withColumn("score", jac(col("_sa"), col("_sb")))
      .filter(col("score") >= cfg.textJaccardThreshold)
      .select(col("probe_id"), col("match_id"), col("score"),
        lit("text_minhash").as("method"))

    val aCand = bandCands("asig", cfg.audioBands, cfg.audioRowsPerBand)
      .join(probeSigs.select(col("clip_id").as("probe_id"), col("asig").as("_ea")), "probe_id")
      .join(stored.select(col("clip_id").as("match_id"), col("asig").as("_eb")), "match_id")
      .filter(est(col("_ea"), col("_eb")) >= cfg.audioEstimateMin)
      .select("probe_id", "match_id")
    val aScored = aCand
      .join(probeSigs.select(col("clip_id").as("probe_id"), col("ashingles").as("_sa")), "probe_id")
      .join(stored.select(col("clip_id").as("match_id"), col("ashingles").as("_sb")), "match_id")
      .withColumn("score", jac(col("_sa"), col("_sb")))
      .filter(col("score") >= cfg.audioJaccardThreshold)
      .select("probe_id", "match_id", "score")
    // PCM confirm on survivors only: probe bytes join + stored bytes semi-join
    val corr = udf((x: Array[Byte], y: Array[Byte]) => PairVerifier.pcmCorrJvm(x, y))
    val activeClips = store.clips.read(spark)
      .filter(col("is_deleted") === false || lit(includeDeleted))
    val neededIds = aScored.select(col("match_id").as("clip_id")).distinct()
    val matchBytes = activeClips.join(neededIds, Seq("clip_id"), "left_semi")
      .select(col("clip_id").as("match_id"), col("bytes").as("_bb"), col("sr_hz").as("_srb"))
    val probeBytes = probes.select(col("clip_id").as("probe_id"),
      col("bytes").as("_ba"), col("sr_hz").as("_sra"))
    val aConfirmed = aScored.join(probeBytes, "probe_id").join(matchBytes, "match_id")
      .filter(col("_sra") === col("_srb"))
      .filter(corr(col("_ba"), col("_bb")) >= cfg.pcmCorrMin)
      .select(col("probe_id"), col("match_id"), col("score"),
        lit("audio_minhash").as("method"))

    // containment: probe winnowing fingerprints vs stored fingerprints,
    // exact longest-common-run confirm (same three-tier verify as the batch
    // pass, ContainmentJoin.pairsFromFps)
    val cj = graft.operators.ContainmentJoin
    val w = cfg.containmentMinRun - cj.GramK + 1
    val sFps = stored.select(col("clip_id").as("match_id"), explode(col("cfps")).as("fp"))
    val fpSizes = sFps.groupBy("fp").agg(count(lit(1)).as("n"))
    // containmentMaxBucket, matching the batch (ContainmentJoin.pairsFromFps)
    // and incremental paths: boilerplate fingerprints are dropped everywhere
    val keptFps = sFps.join(fpSizes.filter(col("n") <= cfg.containmentMaxBucket), "fp")
    val cCands = probeSigs
      .select(col("clip_id").as("probe_id"), explode(col("cfps")).as("fp"))
      .join(keptFps, "fp")
      .filter(col("probe_id") =!= col("match_id"))
      .select("probe_id", "match_id").dropDuplicates("probe_id", "match_id")
    val cScored = cCands
      .join(probeSigs.select(col("clip_id").as("probe_id"),
        lower(col("transcript")).as("_ta"),
        cj.gramsUdf(lower(col("transcript"))).as("_ga")), "probe_id")
      .join(stored.select(col("clip_id").as("match_id"),
        lower(col("transcript")).as("_tb"),
        cj.gramsUdf(lower(col("transcript"))).as("_gb")), "match_id")
      .filter(cj.sharedUdf(col("_ga"), col("_gb")) >= w)
      .filter(cj.lcrUdf(col("_ta"), col("_tb")) >= cfg.containmentMinRun)
      .select(col("probe_id"), col("match_id"), lit(0.9).as("score"),
        lit("containment").as("method"))

    // exact identity: content sha or (non-empty) transcript hash
    val pKeys = probeSigs.select(col("clip_id").as("probe_id"),
      explode(filter(array(concat(lit("s:"), col("sha")),
        concat(lit("t:"), col("tHashExact"))), x => x.isNotNull)).as("k"))
    val sKeys = stored.select(col("clip_id").as("match_id"),
      explode(filter(array(concat(lit("s:"), col("sha")),
        concat(lit("t:"), col("tHashExact"))), x => x.isNotNull)).as("k"))
    val exact = pKeys.join(sKeys, "k")
      .filter(col("probe_id") =!= col("match_id"))
      .select(col("probe_id"), col("match_id"), lit(1.0).as("score"),
        lit("exact").as("method"))
      .dropDuplicates("probe_id", "match_id")

    val allScored = exact.unionByName(tScored).unionByName(aConfirmed)
      .unionByName(cScored)
    // one row per (probe, match): best score wins; score ties resolve by
    // method strength (exact > audio-PCM-confirmed > text > containment)
    val methodPrio = when(col("method") === "exact", 4)
      .when(col("method") === "audio_minhash", 3)
      .when(col("method") === "text_minhash", 2)
      .otherwise(1)
    val best = allScored
      .groupBy("probe_id", "match_id")
      .agg(max(struct(col("score"), methodPrio.as("prio"), col("method"))).as("_m"))
      .select(col("probe_id"), col("match_id"),
        col("_m.score").as("score"), col("_m.method").as("method"))
    best
      .withColumn("rank", row_number().over(
        Window.partitionBy("probe_id")
          .orderBy(col("score").desc, col("match_id"))))
      .filter(col("rank") <= k)
  }
}
