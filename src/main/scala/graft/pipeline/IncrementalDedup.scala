package graft.pipeline

import graft.config.DedupConfig
import graft.operators.{ConnectedComponents, ContainmentJoin, LshCandidates, PairVerifier}
import graft.sources.LakeTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The engine's persistent state: Iceberg-shaped tables (LakeTable shim),
  * hash-bucketed by their key so merges rewrite only touched buckets. */
final class DedupStore(val root: String, val numBuckets: Int = 32) {
  val clips = new LakeTable(root, "clips", "clip_id", numBuckets)
  val signatures = new LakeTable(root, "signatures", "clip_id", numBuckets)
  val dupPairs = new LakeTable(root, "dup_pairs", "a", numBuckets)
  val clusters = new LakeTable(root, "clusters", "clip_id", numBuckets)
}

/**
 * Incremental near-dup indexing: MERGE-INTO over the signature/cluster
 * tables, re-expressing the reference's md5-diff incremental index
 * (improved_faiss_detector.py:269-295,413-469 — new/changed re-embedded,
 * unchanged reused) and its v3 tombstone semantics
 * (incremental_faiss_detector.py:74-87 — deletes preserved, excluded from
 * search). Per the north rule: new clips dedup against the existing corpus
 * WITHOUT full recompute — only the delta is re-signed, candidates are
 * generated delta-vs-all through the same LSH bands, and cluster labels are
 * repaired by re-running connected components on the touched subgraph only.
 *
 * Scale notes: the delta-vs-all candidate join is an equi shuffle join on
 * band keys (the stored side is read pruned to (clip_id, sig) columns);
 * byte-heavy verifies semi-join only the ids that appear in candidate pairs;
 * untouched components never leave their parquet files.
 */
object IncrementalDedup {

  /** Full rebuild (the reference's --force-rebuild, G6). */
  def initialize(spark: SparkSession, clipsDf: DataFrame, cfg: DedupConfig,
                 store: DedupStore): Unit = {
    val res = DedupPipeline.run(spark, clipsDf, cfg)
    store.clips.commit(clipsDf.withColumn("is_deleted", lit(false)), "create")
    store.signatures.commit(res.signatures.withColumn("is_deleted", lit(false)),
      "create", res.metrics.map(m => s"${m.stage}.${m.metric}" -> m.value).toMap)
    store.dupPairs.commit(res.dupPairs, "create")
    // full assignment: every clip gets a component (singletons = own id)
    val assign = res.signatures.select(col("clip_id"))
      .join(res.clusters.select(col("node").as("clip_id"), col("component")),
        Seq("clip_id"), "left")
      .select(col("clip_id"), coalesce(col("component"), col("clip_id")).as("component"))
    store.clusters.commit(assign, "create")
    res.signatures.unpersist(); res.dupPairs.unpersist()
  }

  /**
   * Merge a batch of incoming clips (inserts + updates) and optional
   * deletions into the store. Semantics vs a full rebuild on the merged
   * corpus: identical cluster assignments (IncrementalSpec pins this).
   */
  def merge(spark: SparkSession, incoming: DataFrame, cfg: DedupConfig,
            store: DedupStore, deleteIds: DataFrame = null): Unit = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    import spark.implicits._
    val deletes = Option(deleteIds)
      .getOrElse(Seq.empty[String].toDF("clip_id"))
      .select(col("clip_id")).persist(MEMORY_AND_DISK)

    val prevSigs = store.signatures.read(spark)
    val prevClips = store.clips.read(spark)

    // ---- 1. change detection (J8): content hash diff on the key ----
    // Same 256-bit transcript identity as the batch signature pass (NULL for
    // empty transcripts), compared null-safely. A match against a TOMBSTONED
    // row classifies as 'changed': re-ingesting previously deleted content
    // must resurrect it (re-signed with is_deleted=false), not silently no-op.
    val incKeys = incoming.select(col("clip_id"),
      sha2(col("bytes"), 256).as("_sha"),
      when(length(col("transcript")) > 0, sha2(col("transcript"), 256)).as("_th"))
    val existingKeys = prevSigs.select(
      col("clip_id"), col("sha"), col("tHashExact"), col("is_deleted").as("_tomb"))
    val classified = incKeys.join(existingKeys, Seq("clip_id"), "left")
      .select(col("clip_id"),
        when(col("sha").isNull, "new")
          .when(col("_tomb") ||
            !(col("sha") <=> col("_sha")) || !(col("tHashExact") <=> col("_th")), "changed")
          .otherwise("unchanged").as("kind"))
      .persist(MEMORY_AND_DISK)
    val deltaIds = classified.filter(col("kind") =!= "unchanged").select("clip_id")
    val changedIds = classified.filter(col("kind") === "changed").select("clip_id")

    // ---- 2. re-sign ONLY the delta ----
    val deltaClips = incoming.join(deltaIds, "clip_id")
      .persist(MEMORY_AND_DISK)
    val deltaSigs = DedupPipeline.signatures(spark, deltaClips, cfg)
      .localCheckpoint(eager = true)

    // ---- 3. MERGE the state tables (tombstones, not physical deletes) ----
    val sigsWithTombstones = prevSigs.join(deltaIds, Seq("clip_id"), "left_anti")
      .unionByName(deltaSigs.withColumn("is_deleted", lit(false)))
      .join(deletes.withColumn("_del", lit(true)), Seq("clip_id"), "left")
      .withColumn("is_deleted", col("is_deleted") || coalesce(col("_del"), lit(false)))
      .drop("_del")
      .persist(MEMORY_AND_DISK)
    val mergedClips = prevClips.join(deltaIds, Seq("clip_id"), "left_anti")
      .unionByName(deltaClips.withColumn("is_deleted", lit(false)))
      .join(deletes.withColumn("_del", lit(true)), Seq("clip_id"), "left")
      .withColumn("is_deleted", col("is_deleted") || coalesce(col("_del"), lit(false)))
      .drop("_del")

    // active = visible to search/clustering (reference's tombstone filter F5)
    val activeSigs = sigsWithTombstones.filter(!col("is_deleted"))
      .localCheckpoint(eager = true)
    val activeDelta = deltaSigs.join(deletes, Seq("clip_id"), "left_anti")
      .localCheckpoint(eager = true)

    // ---- 4. candidates: delta vs all-active, same LSH bands ----
    def bandJoin(sigCol: String, bands: Int, rows: Int): DataFrame = {
      val all = LshCandidates.bandKeysHashed(
        activeSigs.filter(col(sigCol).isNotNull).select(col("clip_id"), col(sigCol).as("sig")),
        "clip_id", bands, rows)
      val delta = LshCandidates.bandKeysHashed(
        activeDelta.filter(col(sigCol).isNotNull).select(col("clip_id"), col(sigCol).as("sig")),
        "clip_id", bands, rows)
      // bucket-size guard on the full side (same skew story as the batch path)
      val sizes = all.groupBy("band", "bandVal").agg(count(lit(1)).as("n"))
      val kept = all.join(sizes.filter(col("n") <= cfg.maxBucketSize), Seq("band", "bandVal"))
      delta.select(col("clip_id").as("d"), col("band"), col("bandVal"))
        .join(kept.select(col("clip_id").as("o"), col("band"), col("bandVal")),
          Seq("band", "bandVal"))
        .filter(col("d") =!= col("o"))
        .select(least(col("d"), col("o")).as("a"), greatest(col("d"), col("o")).as("b"))
        .dropDuplicates("a", "b")
    }

    val tCands = bandJoin("tsig", cfg.bands, cfg.rowsPerBand)
    val textPairs = PairVerifier.verify(tCands, activeSigs, "clip_id", "tshingles",
      cfg.textJaccardThreshold, "text_minhash")

    val aCands = bandJoin("asig", cfg.audioBands, cfg.audioRowsPerBand)
    val aPlausible = PairVerifier.estimateScreen(aCands, activeSigs, "clip_id", "asig",
      cfg.audioEstimateMin)
    val audioScreened = PairVerifier.verify(aPlausible, activeSigs, "clip_id", "ashingles",
      cfg.audioJaccardThreshold, "audio_minhash").persist(MEMORY_AND_DISK)
    val activeClips = mergedClips.filter(!col("is_deleted"))
    val audioPairs = PairVerifier.pcmConfirm(audioScreened, activeClips, "clip_id",
      cfg.pcmCorrMin)

    // exact dups: delta keys vs all-active keys
    val exactEdges = {
      val allK = activeSigs.select(col("clip_id").as("o"), col("sha"), col("tHashExact"))
      val dK = activeDelta.select(col("clip_id").as("d"), col("sha"), col("tHashExact"))
      val bySha = dK.join(allK, "sha").select(col("d"), col("o"))
      val byTxt = dK.join(allK.withColumnRenamed("sha", "_s"), "tHashExact")
        .select(col("d"), col("o"))
      bySha.union(byTxt).filter(col("d") =!= col("o"))
        .select(least(col("d"), col("o")).as("a"), greatest(col("d"), col("o")).as("b"))
        .dropDuplicates("a", "b")
        .select(col("a"), col("b"), lit(1.0).as("score"), lit("exact").as("method"))
    }

    // containment: delta fingerprints vs all-active fingerprints
    val containPairs = {
      val allFps = activeSigs.select(col("clip_id"), explode(col("cfps")).as("fp"))
      val dFps = activeDelta.select(col("clip_id").as("d"), explode(col("cfps")).as("fp"))
      val sizes = allFps.groupBy("fp").agg(count(lit(1)).as("n"))
      val kept = allFps.join(sizes.filter(col("n") <= cfg.containmentMaxBucket), "fp")
      val cands = dFps.join(kept.select(col("clip_id").as("o"), col("fp")), "fp")
        .filter(col("d") =!= col("o"))
        .select(least(col("d"), col("o")).as("a"), greatest(col("d"), col("o")).as("b"))
        .dropDuplicates("a", "b")
      val txt = activeSigs.select(col("clip_id"), lower(col("transcript")).as("_lt"),
        ContainmentJoin.gramsUdf(lower(col("transcript"))).as("_g"))
      val w = cfg.containmentMinRun - ContainmentJoin.GramK + 1
      cands
        .join(txt.select(col("clip_id").as("a"), col("_lt").as("_ta"), col("_g").as("_ga")), "a")
        .join(txt.select(col("clip_id").as("b"), col("_lt").as("_tb"), col("_g").as("_gb")), "b")
        .filter(ContainmentJoin.sharedUdf(col("_ga"), col("_gb")) >= w)
        .filter(ContainmentJoin.lcrUdf(col("_ta"), col("_tb")) >= cfg.containmentMinRun)
        .select(col("a"), col("b"), lit(0.9).as("score"), lit("containment").as("method"))
    }

    val newPairs = exactEdges
      .unionByName(textPairs).unionByName(audioPairs).unionByName(containPairs)
      .dropDuplicates("a", "b")
      .localCheckpoint(eager = true)

    // ---- 5. merge the edge table: stale edges (touching changed/deleted
    //         ids) die; delta-derived edges arrive ----
    val invalid = changedIds.union(deletes).distinct()
    val prevPairs = store.dupPairs.read(spark)
    val keptPairs = prevPairs
      .join(invalid.withColumnRenamed("clip_id", "a"), Seq("a"), "left_anti")
      .join(invalid.withColumnRenamed("clip_id", "b"), Seq("b"), "left_anti")
    val mergedPairs = keptPairs.unionByName(newPairs)
      .dropDuplicates("a", "b")
      .persist(MEMORY_AND_DISK)

    // ---- 6. cluster repair on the touched subgraph only ----
    val prevAssign = store.clusters.read(spark) // clip_id, component
    // components touched by: new edges' endpoints, changed ids, deleted ids
    val touchedNodes = newPairs.select(col("a").as("clip_id"))
      .union(newPairs.select(col("b").as("clip_id")))
      .union(invalid)
      .distinct()
    val touchedComps = prevAssign.join(touchedNodes, Seq("clip_id"))
      .select(col("component")).distinct()
    val affectedNodes = prevAssign.join(touchedComps, Seq("component"))
      .select(col("clip_id"))
      .union(touchedNodes) // brand-new ids have no previous assignment
      .distinct()
      .persist(MEMORY_AND_DISK)
    // subgraph = all surviving edges with an affected endpoint (edges stay
    // inside components, so affected-by-a covers affected-by-b for old
    // edges; new edges' endpoints are affected by construction)
    val subEdges = mergedPairs
      .join(affectedNodes.withColumnRenamed("clip_id", "a"), Seq("a"))
      .select("a", "b")
      .persist(MEMORY_AND_DISK)
    val repaired = ConnectedComponents.run(subEdges, nEdgesHint = subEdges.count())
      .select(col("node").as("clip_id"), col("component"))
    val activeIds = activeSigs.select(col("clip_id"))
    val newAssign = activeIds
      .join(affectedNodes.withColumn("_aff", lit(true)), Seq("clip_id"), "left")
      .join(prevAssign.withColumnRenamed("component", "_old"), Seq("clip_id"), "left")
      .join(repaired.withColumnRenamed("component", "_new"), Seq("clip_id"), "left")
      .select(col("clip_id"),
        coalesce(
          when(col("_aff").isNotNull, coalesce(col("_new"), col("clip_id")))
            .otherwise(col("_old")),
          col("clip_id")).as("component"))

    // ---- 7. commit (snapshot isolation: readers flip atomically) ----
    // O(delta) I/O: only buckets containing a changed/deleted id are read
    // (bucket-pruned) and rewritten; every untouched bucket's files are
    // reused by the new snapshot via the manifest. Compute above is already
    // O(delta); without this, every merge rewrote the full corpus — the
    // scale-killer for "new clips dedup without full recompute" at 10^12.
    val nDelta = deltaClips.count()
    val touchedIds = deltaIds.union(deletes)
    val touchedIdBuckets = touchedIds
      .select(store.signatures.bucketOf.cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    def applyDeletes(df: DataFrame): DataFrame = df
      .join(deletes.withColumn("_del", lit(true)), Seq("clip_id"), "left")
      .withColumn("is_deleted", col("is_deleted") || coalesce(col("_del"), lit(false)))
      .drop("_del")
    val touchedClips = applyDeletes(
      store.clips.readBuckets(spark, touchedIdBuckets)
        .join(deltaIds, Seq("clip_id"), "left_anti")
        .unionByName(deltaClips.withColumn("is_deleted", lit(false))))
    store.clips.commitDelta(touchedClips, touchedIdBuckets, "merge",
      Map("delta_rows" -> nDelta))
    val touchedSigs = applyDeletes(
      store.signatures.readBuckets(spark, touchedIdBuckets)
        .join(deltaIds, Seq("clip_id"), "left_anti")
        .unionByName(deltaSigs.withColumn("is_deleted", lit(false))))
    store.signatures.commitDelta(touchedSigs, touchedIdBuckets, "merge",
      Map("delta_rows" -> nDelta))

    val nNew = newPairs.count()
    val invalidA = invalid.withColumnRenamed("clip_id", "a")
    val invalidB = invalid.withColumnRenamed("clip_id", "b")
    // pairs bucket on `a`; an edge dies if EITHER endpoint is invalid, so the
    // touched set is the a-buckets of removed edges plus new edges' a-buckets
    val removedA = prevPairs.join(invalidA, Seq("a"), "left_semi").select("a")
      .union(prevPairs.join(invalidB, Seq("b"), "left_semi").select("a"))
    val touchedPairBuckets = removedA.union(newPairs.select("a"))
      .select(store.dupPairs.bucketOf.cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    val touchedPairs = store.dupPairs.readBuckets(spark, touchedPairBuckets)
      .join(invalidA, Seq("a"), "left_anti")
      .join(invalidB, Seq("b"), "left_anti")
      .unionByName(newPairs)
      .dropDuplicates("a", "b")
    store.dupPairs.commitDelta(touchedPairs, touchedPairBuckets, "merge",
      Map("new_pairs" -> nNew))

    // untouched nodes keep rows identical to the previous snapshot, so only
    // buckets holding an affected/new/deleted id need rewriting
    val clusterTouched = affectedNodes.select("clip_id").union(touchedIds)
      .select(store.clusters.bucketOf.cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    store.clusters.commitDelta(newAssign, clusterTouched, "merge")

    Seq(deletes, classified, deltaClips, audioScreened, mergedPairs, affectedNodes,
      subEdges).foreach(_.unpersist())
  }

  /** Physical cleanup — the reference v3 `cleanup` mode
    * (incremental_faiss_detector.py:775-810): tombstoned rows are dropped
    * from clips/signatures (they are already absent from pairs/clusters),
    * then all but the newest `retain` snapshots of every table are expired
    * and their unreferenced data files deleted. Without this a long-running
    * store grows without bound in both data and snapshot count. */
  def compact(spark: SparkSession, store: DedupStore, retain: Int = 1): Unit = {
    store.clips.commit(
      store.clips.read(spark).filter(!col("is_deleted")), "compact")
    store.signatures.commit(
      store.signatures.read(spark).filter(!col("is_deleted")), "compact")
    Seq(store.clips, store.signatures, store.dupPairs, store.clusters)
      .foreach(_.expireSnapshots(retain))
  }
}
