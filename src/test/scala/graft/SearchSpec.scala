package graft

import graft.config.DedupConfig
import graft.pipeline.{ClipSearch, DedupStore, IncrementalDedup}
import graft.sources.{Clip, ClipCorpus, CorpusConfig}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Read-only top-k search vs a brute-force oracle: exact copies hit rank 1 at
 * score 1.0, planted near-dups retrieve their cluster, fresh content retrieves
 * nothing, and the store is never mutated (reference search semantics,
 * improved_faiss_detector.py:522-556; tombstone filter
 * incremental_faiss_detector.py:566-572).
 */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  val cfg = DedupConfig.default
  val cc = CorpusConfig(seed = 42L, n = 300L)

  private lazy val store: DedupStore = {
    val s = new DedupStore(
      java.nio.file.Files.createTempDirectory("graft-search").toString)
    val conf = cc // local copy: the closure must not capture the suite
    val clips = spark.range(0, conf.n, 1, 4)
      .mapPartitions(_.map(i => ClipCorpus.genClip(conf, i))).toDF()
    IncrementalDedup.initialize(spark, clips, cfg, s)
    s
  }

  private def probeFrom(ids: Seq[Long], mutate: Clip => Clip = identity): DataFrame =
    ids.map { i =>
      val c = mutate(ClipCorpus.genClip(cc, i))
      Clip(s"probe_${c.clip_id}", c.bytes, c.sr_hz, c.dur_ms, c.codec, c.transcript)
    }.toDF()

  test("byte-identical probe retrieves its original at rank 1, score 1.0") {
    val res = ClipSearch.search(spark, probeFrom(Seq(0L, 1L, 2L)), store, cfg, k = 5)
      .collect()
    Seq(0L, 1L, 2L).foreach { i =>
      val pid = f"probe_clip_$i%08d"
      val mine = res.filter(_.getAs[String]("probe_id") == pid)
      val top = mine.filter(_.getAs[Int]("rank") == 1).head
      // rank 1 is an exact score-1.0 match (the original, or one of its
      // byte-identical planted duplicates — ties break by match_id)
      assert(top.getAs[Double]("score") == 1.0 &&
        top.getAs[String]("method") == "exact")
      // and the original itself surfaces as an exact 1.0 match
      val orig = mine.filter(_.getAs[String]("match_id") == f"clip_$i%08d")
      assert(orig.length == 1 && orig.head.getAs[Double]("score") == 1.0 &&
        orig.head.getAs[String]("method") == "exact",
        s"probe $pid did not exact-match its original")
    }
  }

  test("planted cluster members retrieve a co-member; results verify exactly") {
    val golden = ClipCorpus.goldenLabels(spark, cc).toDF()
    val members = golden.filter($"cluster_id" >= 0)
      .groupBy("cluster_id").agg(collect_list("clip_id").as("m"), count(lit(1)).as("n"))
      .filter($"n" >= 2).select("m").as[Seq[String]].collect()
    val probeIds = members.take(5).map(_.last.stripPrefix("clip_").toLong).toSeq
    val clusterOf = members.flatMap(ms => ms.map(_ -> ms.toSet)).toMap
    val res = ClipSearch.search(spark, probeFrom(probeIds), store, cfg, k = 10).collect()
    probeIds.foreach { i =>
      val pid = f"probe_clip_$i%08d"
      // clusters are TRANSITIVE closures; search returns direct matches, so
      // require the exact original plus at least one co-member
      val expected = clusterOf(f"clip_$i%08d") - f"clip_$i%08d"
      val got = res.filter(_.getAs[String]("probe_id") == pid)
        .map(_.getAs[String]("match_id")).toSet
      assert(got.contains(f"clip_$i%08d"), s"probe $pid missed its original")
      assert(got.intersect(expected).nonEmpty,
        s"probe $pid found none of ${expected.take(3)}")
    }
  }

  test("fresh content retrieves nothing; search never mutates the store") {
    val vBefore = (store.signatures.currentVersion, store.clusters.currentVersion)
    val donor = CorpusConfig(seed = 777L, n = 10L)
    val fresh = (0L until 3L).map { i =>
      val c = ClipCorpus.genClip(donor, i)
      Clip(s"fresh_$i", c.bytes, c.sr_hz, c.dur_ms, c.codec, c.transcript)
    }.toDF()
    val res = ClipSearch.search(spark, fresh, store, cfg, k = 5)
    assert(res.count() == 0, "distractor probes must not match")
    assert((store.signatures.currentVersion, store.clusters.currentVersion) == vBefore)
  }

  test("fusion-mode search ranks by the weighted cross-method score") {
    import graft.operators.FusionConfig
    val fc = FusionConfig(weights = Map("exact" -> 0.4, "text_minhash" -> 0.3,
      "audio_minhash" -> 0.2, "containment" -> 0.1), method = "weighted_fusion",
      threshold = 0.2)
    val res = ClipSearch.search(spark, probeFrom(Seq(1L, 2L)), store, cfg,
      k = 5, fusion = Some(fc)).collect()
    Seq(1L, 2L).foreach { i =>
      val mine = res.filter(_.getAs[String]("probe_id") == f"probe_clip_$i%08d")
      assert(mine.nonEmpty, s"fusion search empty for probe $i")
      assert(mine.forall(_.getAs[String]("method") == "weighted_fusion"))
      val top = mine.filter(_.getAs[Int]("rank") == 1).head
      // a byte-identical probe scores ~1.0 on every method it fires
      // (containment's fixed 0.9 pulls the weighted mix slightly below 1)
      assert(top.getAs[Double]("score") >= 0.9,
        s"fused top score ${top.getAs[Double]("score")}")
    }
  }

  test("prefix-contained short probe gets the same verdict from search and merge") {
    // pcmCorrJvm truncates to the shorter signal, so a 70%-length prefix of a
    // stored clip correlates ~1.0 and its shingle jaccard (~0.7) clears the
    // 0.35 audio verify floor — only the length-ratio >= 0.9 geometry gate
    // rejects it. Search used to omit that gate: the same pair was accepted
    // by search but rejected by merge. Both paths must agree.
    val s = new DedupStore(
      java.nio.file.Files.createTempDirectory("graft-prefix").toString)
    val conf = cc
    val clips = spark.range(0, 50, 1, 4)
      .mapPartitions(_.map(i => ClipCorpus.genClip(conf, i))).toDF()
    IncrementalDedup.initialize(spark, clips, cfg, s)
    val orig = ClipCorpus.genClip(cc, 0L)
    // sample-aligned prefix at 70% (even byte count keeps int16 framing);
    // empty transcript so only the audio path can fire
    val prefixBytes = orig.bytes.take((orig.bytes.length * 7 / 10) / 2 * 2)
    // search side FIRST (against the pristine store — after the merge below
    // the probe would exact-match its own merged copy, correctly): the
    // prefix as a probe must retrieve nothing — its only would-be match is
    // the full-length source, rejected by the geometry gate
    val probe = Seq(Clip("probe_prefix", prefixBytes, orig.sr_hz,
      orig.dur_ms * 7 / 10, orig.codec, "")).toDF()
    val found = ClipSearch.search(spark, probe, s, cfg, k = 5).collect()
    // merge side: the same content as a new clip must NOT pair with its source
    IncrementalDedup.merge(spark,
      Seq(Clip("clip_zprefix", prefixBytes, orig.sr_hz,
        orig.dur_ms * 7 / 10, orig.codec, "")).toDF(), cfg, s)
    val mergedPairs = s.dupPairs.read(spark)
      .filter(col("a") === "clip_zprefix" || col("b") === "clip_zprefix")
      .collect()
    assert(mergedPairs.isEmpty,
      s"merge linked the prefix clip: ${mergedPairs.take(3).mkString(", ")}")
    assert(found.isEmpty,
      s"search accepted what merge rejected: ${found.take(3).mkString(", ")}")
  }

  test("tombstoned entries are excluded unless includeDeleted (v3 semantics)") {
    val victim = "clip_00000000"
    IncrementalDedup.merge(spark, Seq.empty[Clip].toDF(), cfg, store,
      deleteIds = Seq(victim).toDF("clip_id"))
    val probes = probeFrom(Seq(0L))
    val excl = ClipSearch.search(spark, probes, store, cfg, k = 5)
      .filter(col("match_id") === victim).count()
    assert(excl == 0, "tombstoned match leaked into default search")
    val incl = ClipSearch.search(spark, probes, store, cfg, k = 5,
      includeDeleted = true)
      .filter(col("match_id") === victim).count()
    assert(incl == 1, "includeDeleted must surface the tombstoned entry")
  }
}
