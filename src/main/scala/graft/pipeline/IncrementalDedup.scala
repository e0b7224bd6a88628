package graft.pipeline

import graft.config.DedupConfig
import graft.operators.{ConnectedComponents, ContainmentJoin, LshCandidates, PairVerifier}
import graft.sources.LakeTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The engine's persistent state: Iceberg-shaped tables (LakeTable shim),
  * hash-bucketed by their key so merges rewrite only touched buckets.
  *
  * Row tables bucket by id; the three INVERTED-INDEX tables bucket by their
  * JOIN VALUE (band hash / winnowing fingerprint / exact-content key), so a
  * delta or probe batch computes its own values, maps them to bucket ids,
  * and reads ONLY those buckets — the candidate join against a 10^12-row
  * corpus scans O(delta x matched-buckets), never the corpus (the
  * reference's FAISS index lookup re-expressed as bucket-pruned table
  * reads; "the table IS the index", SURVEY.md S5). */
final class DedupStore(val root: String, val numBuckets: Int = 32) {
  val clips = new LakeTable(root, "clips", "clip_id", numBuckets)
  val signatures = new LakeTable(root, "signatures", "clip_id", numBuckets)
  val dupPairs = new LakeTable(root, "dup_pairs", "a", numBuckets)
  val clusters = new LakeTable(root, "clusters", "clip_id", numBuckets)
  // inverted indexes (value-bucketed); rows carry is_deleted so tombstoned
  // clips stay searchable with includeDeleted (v3 semantics) until compact
  val bands = new LakeTable(root, "bands", "bandVal", numBuckets)
  val fps = new LakeTable(root, "fps", "fp", numBuckets)
  val exactKeys = new LakeTable(root, "exact_keys", "k", numBuckets)
  // component-bucketed mirror of clusters: merge repair needs "all members
  // of these components", which the id-bucketed table cannot prune
  val clustersByComp = new LakeTable(root, "clusters_by_comp", "component", numBuckets)
}

/**
 * Incremental near-dup indexing: MERGE-INTO over the signature/cluster
 * tables, re-expressing the reference's md5-diff incremental index
 * (improved_faiss_detector.py:269-295,413-469 — new/changed re-embedded,
 * unchanged reused) and its v3 tombstone semantics
 * (incremental_faiss_detector.py:74-87 — deletes preserved, excluded from
 * search). Per the north rule: new clips dedup against the existing corpus
 * WITHOUT full recompute — only the delta is re-signed, candidates come
 * from bucket-pruned reads of the stored band/fingerprint/key indexes, and
 * cluster labels are repaired by re-running connected components on the
 * touched subgraph only.
 *
 * Scale notes: every read of a big table in this path is bucket-pruned
 * (readBuckets) to the delta's own hash values, the candidate endpoints,
 * or the touched component ids (via the component-bucketed clusters
 * mirror) — no stage of a merge scans the corpus.
 */
object IncrementalDedup {

  // ---- inverted-index row builders (pure functions of a signature DF) ----

  /** (clip_id, modality, band, bandVal) for both LSH modalities. */
  def bandRows(sigs: DataFrame, cfg: DedupConfig): DataFrame = {
    val t = LshCandidates.bandKeysHashed(sigs.filter(col("tsig").isNotNull)
        .select(col("clip_id"), col("tsig").as("sig")),
        "clip_id", cfg.bands, cfg.rowsPerBand)
      .select(col("clip_id"), lit("text").as("modality"), col("band"), col("bandVal"))
    val a = LshCandidates.bandKeysHashed(sigs.filter(col("asig").isNotNull)
        .select(col("clip_id"), col("asig").as("sig")),
        "clip_id", cfg.audioBands, cfg.audioRowsPerBand)
      .select(col("clip_id"), lit("audio").as("modality"), col("band"), col("bandVal"))
    t.unionByName(a)
  }

  /** (clip_id, fp) winnowing fingerprints. */
  def fpRows(sigs: DataFrame): DataFrame =
    sigs.select(col("clip_id"), explode(col("cfps")).as("fp"))

  /** (clip_id, k) tagged exact-content keys (s:sha / t:transcript-hash;
    * the t: key is absent for empty transcripts — same guard as the batch
    * exact stage). */
  def keyRows(sigs: DataFrame): DataFrame =
    sigs.select(col("clip_id"), explode(filter(array(
      concat(lit("s:"), col("sha")), concat(lit("t:"), col("tHashExact"))),
      x => x.isNotNull)).as("k"))

  /** Distinct store-bucket ids of `df`'s key column — the tiny driver action
    * (<= numBuckets ints) that turns a delta's values into a pruned read. */
  private[pipeline] def bucketsOf(df: DataFrame, t: LakeTable): Set[Int] =
    df.select(t.bucketOf.cast("int").as("b")).distinct()
      .collect().map(_.getInt(0)).toSet

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
    store.clustersByComp.commit(assign, "create")
    store.bands.commit(bandRows(res.signatures, cfg)
      .withColumn("is_deleted", lit(false)), "create")
    store.fps.commit(fpRows(res.signatures)
      .withColumn("is_deleted", lit(false)), "create")
    store.exactKeys.commit(keyRows(res.signatures)
      .withColumn("is_deleted", lit(false)), "create")
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

    // ---- 1. change detection (J8): content hash diff on the key ----
    // Same 256-bit transcript identity as the batch signature pass (NULL for
    // empty transcripts), compared null-safely. A match against a TOMBSTONED
    // row classifies as 'changed': re-ingesting previously deleted content
    // must resurrect it (re-signed with is_deleted=false), not silently no-op.
    // The previous-signature lookup is bucket-pruned to the incoming ids.
    val incKeys = incoming.select(col("clip_id"),
      sha2(col("bytes"), 256).as("_sha"),
      when(length(col("transcript")) > 0, sha2(col("transcript"), 256)).as("_th"))
    val incBkts = bucketsOf(incoming.select("clip_id"), store.signatures)
    val existingKeys = store.signatures.readBuckets(spark, incBkts).select(
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
    val invalid = deltaIds.union(deletes).distinct().persist(MEMORY_AND_DISK)
    // "no changes" early-exit (the reference's idempotent update path,
    // improved_faiss_detector.py:421-427): an all-unchanged batch with no
    // deletes must not pay the candidate/verify/commit machinery
    if (invalid.isEmpty) {
      Seq(deletes, classified, invalid).foreach(_.unpersist())
      return
    }

    // ---- 2. re-sign ONLY the delta ----
    val deltaClips = incoming.join(deltaIds, "clip_id")
      .persist(MEMORY_AND_DISK)
    val deltaSigs = DedupPipeline.signatures(spark, deltaClips, cfg)
      .localCheckpoint(eager = true)
    val sigCols = deltaSigs.columns.toSeq
    val activeDelta = deltaSigs.join(deletes, Seq("clip_id"), "left_anti")
      .localCheckpoint(eager = true)

    // previous signature rows of invalidated ids — locates every stale
    // index row (index rows are a deterministic function of the signature)
    val invalidSigBkts = bucketsOf(invalid, store.signatures)
    val oldSigs = store.signatures.readBuckets(spark, invalidSigBkts)
      .join(invalid, Seq("clip_id"), "left_semi")
      .select(sigCols.map(col): _*)
      .localCheckpoint(eager = true)

    // ---- 3. candidates: delta values -> bucket-pruned index reads ----
    val deltaBands = bandRows(activeDelta, cfg).persist(MEMORY_AND_DISK)
    val bandBkts = bucketsOf(deltaBands, store.bands)
    val storedBands = store.bands.readBuckets(spark, bandBkts)
      .filter(!col("is_deleted"))
      .join(invalid, Seq("clip_id"), "left_anti")
      .select("clip_id", "modality", "band", "bandVal")
    val allBands = storedBands.unionByName(deltaBands)
    // bucket-size guard (same skew story as the batch path): counts are
    // complete because a bandVal's rows all live in one store bucket
    val bSizes = allBands.groupBy("modality", "band", "bandVal")
      .agg(count(lit(1)).as("n"))
    val bKept = allBands.join(bSizes.filter(col("n") <= cfg.maxBucketSize),
      Seq("modality", "band", "bandVal"))
    val bandCands = deltaBands
      .select(col("clip_id").as("d"), col("modality"), col("band"), col("bandVal"))
      .join(bKept.select(col("clip_id").as("o"), col("modality"), col("band"), col("bandVal")),
        Seq("modality", "band", "bandVal"))
      .filter(col("d") =!= col("o"))
      .select(col("modality"), least(col("d"), col("o")).as("a"),
        greatest(col("d"), col("o")).as("b"))
      .dropDuplicates("a", "b", "modality")
      .persist(MEMORY_AND_DISK)
    val tCands = bandCands.filter(col("modality") === "text").select("a", "b")
    val aCands = bandCands.filter(col("modality") === "audio").select("a", "b")

    // containment candidates: delta fingerprints vs stored fingerprint index
    val deltaFps = fpRows(activeDelta).persist(MEMORY_AND_DISK)
    val fpBkts = bucketsOf(deltaFps, store.fps)
    val storedFps = store.fps.readBuckets(spark, fpBkts)
      .filter(!col("is_deleted"))
      .join(invalid, Seq("clip_id"), "left_anti")
      .select("clip_id", "fp")
    val allFps = storedFps.unionByName(deltaFps)
    val fSizes = allFps.groupBy("fp").agg(count(lit(1)).as("n"))
    val fKept = allFps.join(fSizes.filter(col("n") <= cfg.containmentMaxBucket), "fp")
    val cCands = deltaFps.select(col("clip_id").as("d"), col("fp"))
      .join(fKept.select(col("clip_id").as("o"), col("fp")), "fp")
      .filter(col("d") =!= col("o"))
      .select(least(col("d"), col("o")).as("a"), greatest(col("d"), col("o")).as("b"))
      .dropDuplicates("a", "b")
      .persist(MEMORY_AND_DISK)

    // exact dups: delta keys vs stored key index, ONE edge per (delta, key)
    // to the group minimum — linear in delta, never in group size; CC
    // transitivity chains the rest of the group through its existing edges
    val deltaKeys = keyRows(activeDelta).persist(MEMORY_AND_DISK)
    val keyBkts = bucketsOf(deltaKeys, store.exactKeys)
    val storedKeys = store.exactKeys.readBuckets(spark, keyBkts)
      .filter(!col("is_deleted"))
      .join(invalid, Seq("clip_id"), "left_anti")
      .select("clip_id", "k")
    val keyHeads = storedKeys.unionByName(deltaKeys)
      .groupBy("k").agg(min("clip_id").as("o"), count(lit(1)).as("n"))
      .filter(col("n") > 1)
    val exactEdges = deltaKeys.select(col("clip_id").as("d"), col("k"))
      .join(keyHeads, "k")
      .filter(col("d") =!= col("o"))
      .select(least(col("d"), col("o")).as("a"), greatest(col("d"), col("o")).as("b"))
      .dropDuplicates("a", "b")
      .select(col("a"), col("b"), lit(1.0).as("score"), lit("exact").as("method"))

    // ---- 4. verify on candidate endpoints only (bucket-pruned features) ----
    val endIds = bandCands.select(col("a").as("clip_id"))
      .union(bandCands.select(col("b").as("clip_id")))
      .union(cCands.select(col("a").as("clip_id")))
      .union(cCands.select(col("b").as("clip_id")))
      .distinct()
    val featBkts = bucketsOf(endIds, store.signatures)
    val feats = store.signatures.readBuckets(spark, featBkts)
      .filter(!col("is_deleted"))
      .join(deltaIds, Seq("clip_id"), "left_anti")
      .select(sigCols.map(col): _*)
      .unionByName(activeDelta)
      // endpoints only: the bucket slice still holds every co-bucketed row,
      // and persisting it would cache ~the whole table at small bucket counts
      .join(endIds, Seq("clip_id"), "left_semi")
      .persist(MEMORY_AND_DISK)

    val textPairs = PairVerifier.verify(tCands, feats, "clip_id", "tshingles",
      cfg.textJaccardThreshold, "text_minhash")
    val aPlausible = PairVerifier.estimateScreen(aCands, feats, "clip_id", "asig",
      cfg.audioEstimateMin).persist(MEMORY_AND_DISK)
    val audioScreened = PairVerifier.verify(aPlausible, feats, "clip_id", "ashingles",
      cfg.audioJaccardThreshold, "audio_minhash").persist(MEMORY_AND_DISK)
    // PCM confirm bytes: pruned clips read for the screened endpoints
    val aIds = audioScreened.select(col("a").as("clip_id"))
      .union(audioScreened.select(col("b").as("clip_id"))).distinct()
    val clipBkts = bucketsOf(aIds, store.clips)
    val clipCols = deltaClips.columns.toSeq
    val activeClips = store.clips.readBuckets(spark, clipBkts)
      .filter(!col("is_deleted"))
      .join(deltaIds, Seq("clip_id"), "left_anti")
      .select(clipCols.map(col): _*)
      .unionByName(deltaClips.join(deletes, Seq("clip_id"), "left_anti"))
    val audioPairs = PairVerifier.pcmConfirm(audioScreened, activeClips, "clip_id",
      cfg.pcmCorrMin)

    // containment verify: gram prefilter + exact LCS on candidate endpoints
    val containPairs = {
      val txt = feats.select(col("clip_id"), lower(col("transcript")).as("_lt"),
        ContainmentJoin.gramsUdf(lower(col("transcript"))).as("_g"))
      val w = cfg.containmentMinRun - ContainmentJoin.GramK + 1
      cCands
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

    // ---- 5. cluster repair on the touched subgraph only ----
    // "members of touched components" via the component-bucketed mirror:
    // node->component lookups prune by id buckets, membership lookups prune
    // by component buckets — no full scan anywhere in the repair path
    val touchedNodes = newPairs.select(col("a").as("clip_id"))
      .union(newPairs.select(col("b").as("clip_id")))
      .union(invalid)
      .distinct()
      .persist(MEMORY_AND_DISK)
    val touchedComps = store.clusters
      .readBuckets(spark, bucketsOf(touchedNodes, store.clusters))
      .join(touchedNodes, Seq("clip_id"))
      .select(col("component")).distinct()
      .persist(MEMORY_AND_DISK)
    val touchedCompBkts = bucketsOf(touchedComps, store.clustersByComp)
    val affectedNodes = store.clustersByComp.readBuckets(spark, touchedCompBkts)
      .join(touchedComps, Seq("component"))
      .select(col("clip_id"))
      .union(touchedNodes) // brand-new ids have no previous assignment
      .distinct()
      .persist(MEMORY_AND_DISK)
    // surviving edges with an affected endpoint: edges stay inside
    // components, so the a-buckets of affected nodes cover them
    val affPairBkts = bucketsOf(affectedNodes.withColumnRenamed("clip_id", "a"),
      store.dupPairs)
    val invalidA = invalid.withColumnRenamed("clip_id", "a")
    val invalidB = invalid.withColumnRenamed("clip_id", "b")
    val prevPairsAff = store.dupPairs.readBuckets(spark, affPairBkts)
      .persist(MEMORY_AND_DISK)
    val subEdges = prevPairsAff
      .join(invalidA, Seq("a"), "left_anti")
      .join(invalidB, Seq("b"), "left_anti")
      .select("a", "b")
      .unionByName(newPairs.select("a", "b"))
      .join(affectedNodes.withColumnRenamed("clip_id", "a"), Seq("a"))
      .persist(MEMORY_AND_DISK)
    val repaired = ConnectedComponents.run(subEdges, nEdgesHint = subEdges.count())
      .select(col("node").as("clip_id"), col("component"))

    // ---- 6. commit (snapshot isolation: readers flip atomically) ----
    // O(delta) I/O: only buckets containing a changed/deleted id (row
    // tables) or a delta hash value (index tables) are read and rewritten;
    // every untouched bucket's files are reused via the manifest.
    val nDelta = deltaClips.count()
    val touchedIds = deltaIds.union(deletes)
    val touchedIdBuckets = bucketsOf(touchedIds, store.signatures)
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

    // index tables: stale rows of delta ids die, delta rows arrive, rows of
    // deleted ids stay but are tombstone-flagged (searchable until compact)
    def updateIndex(t: LakeTable, newRows: DataFrame, oldRows: DataFrame): Unit = {
      val touched = bucketsOf(newRows, t) ++ bucketsOf(oldRows, t)
      val content = applyDeletes(
        t.readBuckets(spark, touched)
          .join(deltaIds, Seq("clip_id"), "left_anti")
          .unionByName(newRows.withColumn("is_deleted", lit(false))))
      t.commitDelta(content, touched, "merge")
    }
    updateIndex(store.bands, deltaBands, bandRows(oldSigs, cfg))
    updateIndex(store.fps, deltaFps, fpRows(oldSigs))
    updateIndex(store.exactKeys, deltaKeys, keyRows(oldSigs))

    val nNew = newPairs.count()
    // pairs bucket on `a`; an edge dies if EITHER endpoint is invalid, and
    // all such edges live in affected components (pruned read above)
    val removedA = prevPairsAff.join(invalidA, Seq("a"), "left_semi").select("a")
      .union(prevPairsAff.join(invalidB, Seq("b"), "left_semi").select("a"))
    val touchedPairBuckets = bucketsOf(
      removedA.union(newPairs.select("a")), store.dupPairs)
    val touchedPairs = store.dupPairs.readBuckets(spark, touchedPairBuckets)
      .join(invalidA, Seq("a"), "left_anti")
      .join(invalidB, Seq("b"), "left_anti")
      .unionByName(newPairs)
      .dropDuplicates("a", "b")
    store.dupPairs.commitDelta(touchedPairs, touchedPairBuckets, "merge",
      Map("new_pairs" -> nNew))

    // clusters: rebuild complete rows for touched buckets only (unchanged
    // rows reread from the pruned slice, affected rows repaired, deleted
    // rows dropped, brand-new actives added)
    val clusterTouched = bucketsOf(
      affectedNodes.select("clip_id").union(touchedIds), store.clusters)
    val prevTouchedAssign = store.clusters.readBuckets(spark, clusterTouched)
      .persist(MEMORY_AND_DISK)
    val baseIds = prevTouchedAssign.select("clip_id")
      .union(deltaIds)
      .distinct()
      .join(deletes, Seq("clip_id"), "left_anti")
    val newAssign = baseIds
      .join(affectedNodes.withColumn("_aff", lit(true)), Seq("clip_id"), "left")
      .join(prevTouchedAssign.withColumnRenamed("component", "_old"), Seq("clip_id"), "left")
      .join(repaired.withColumnRenamed("component", "_new"), Seq("clip_id"), "left")
      .select(col("clip_id"),
        coalesce(
          when(col("_aff").isNotNull, coalesce(col("_new"), col("clip_id")))
            .otherwise(col("_old")),
          col("clip_id")).as("component"))
    store.clusters.commitDelta(newAssign, clusterTouched, "merge")

    // mirror: affected ids' rows move between component buckets (old comps
    // are touched via touchedComps, new comps via the repaired rows)
    val mirrorNewRows = newAssign.join(
      affectedNodes.select("clip_id").union(deltaIds).distinct(),
      Seq("clip_id"), "left_semi")
    val mirrorTouched = touchedCompBkts ++
      bucketsOf(mirrorNewRows.select("component"), store.clustersByComp)
    val mirrorContent = store.clustersByComp.readBuckets(spark, mirrorTouched)
      .join(affectedNodes.select("clip_id").union(touchedIds).distinct(),
        Seq("clip_id"), "left_anti")
      .unionByName(mirrorNewRows)
    store.clustersByComp.commitDelta(mirrorContent, mirrorTouched, "merge")

    Seq(deletes, classified, invalid, deltaClips, deltaBands, bandCands,
      deltaFps, cCands, deltaKeys, feats, aPlausible, audioScreened,
      touchedNodes, touchedComps, affectedNodes, prevPairsAff, subEdges,
      prevTouchedAssign)
      .foreach(_.unpersist())
  }

  /** Physical cleanup — the reference v3 `cleanup` mode
    * (incremental_faiss_detector.py:775-810): tombstoned rows are dropped
    * from clips/signatures and the inverted indexes (they are already absent
    * from pairs/clusters), then all but the newest `retain` snapshots of
    * every table are expired and their unreferenced data files deleted.
    * Without this a long-running store grows without bound in both data and
    * snapshot count. */
  def compact(spark: SparkSession, store: DedupStore, retain: Int = 1): Unit = {
    Seq(store.clips, store.signatures, store.bands, store.fps, store.exactKeys)
      .foreach(t => t.commit(t.read(spark).filter(!col("is_deleted")), "compact"))
    Seq(store.clips, store.signatures, store.dupPairs, store.clusters,
      store.clustersByComp, store.bands, store.fps, store.exactKeys)
      .foreach(_.expireSnapshots(retain))
  }
}
