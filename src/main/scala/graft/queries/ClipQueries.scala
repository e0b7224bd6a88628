package graft.queries

import graft.config.DedupConfig
import graft.pipeline.DedupPipeline
import graft.sources.{ClipCorpus, CorpusConfig}
import org.apache.spark.sql.functions._

/**
 * The flagship audio clip + transcript dedup pipeline (BASELINE.json
 * north_star) over the deterministically synthesized corpus (TESTDATA has no
 * audio table; no external data). Not SQL-expressible in DuckDB (PCM decode,
 * LSH, CC) — these queries take the driver's rows-only check; exactness vs
 * the brute-force oracle is enforced by ScalaTest (PipelineSpec: dup-pair
 * recall >= 0.99, precision >= 0.97 on planted clusters).
 *
 * Corpus size scales with the sf dir so the sf0.1 bench measures real
 * throughput while the sf0.01 verify stays fast.
 */
object ClipQueries {

  def clipCount(dir: String): Long =
    if (dir.contains("sf0.1")) 20000L
    else if (dir.contains("sf0.01")) 4000L
    else 1000L

  def corpusConfig(dir: String): CorpusConfig =
    CorpusConfig(seed = 42L, n = clipCount(dir))

  // The three clip_* queries share one pipeline execution per sf dir (the
  // driver's Verify runs them back-to-back; three full runs would triple its
  // wall time for identical results).
  private val resultCache =
    scala.collection.mutable.Map[String, graft.pipeline.PipelineResult]()
  private def pipelineFor(spark: org.apache.spark.sql.SparkSession, dir: String) =
    resultCache.synchronized {
      // keyed by session identity too: cached DataFrames die with their session
      resultCache.getOrElseUpdate(s"${System.identityHashCode(spark)}|$dir", {
        val clips = ClipCorpus.clips(spark, corpusConfig(dir)).toDF()
        DedupPipeline.run(spark, clips, DedupConfig.default)
      })
    }

  val clusters = QueryDef(
    "clip_dedup_clusters",
    (spark, dir) =>
      pipelineFor(spark, dir)
        .clusters
        .select(col("node").as("clip_id"), col("component"), col("clusterSize"))
        .orderBy("clip_id"),
    None)

  val dupPairs = QueryDef(
    "clip_dup_pairs",
    (spark, dir) => pipelineFor(spark, dir).dupPairs.orderBy("a", "b"),
    None)

  val signatures = QueryDef(
    "clip_signatures",
    (spark, dir) => {
      // text shingles live outside the hub (DedupPipeline.textShingleCol —
      // hub-width discipline); recompute them from the same deterministic
      // corpus the pipeline ran on
      val tsh = ClipCorpus.clips(spark, corpusConfig(dir)).toDF()
        .select(col("clip_id"),
          size(DedupPipeline.textShingleCol(DedupConfig.default))
            .cast("long").as("n_text_shingles"))
      pipelineFor(spark, dir).signatures
        .select(col("clip_id"), col("sha"), col("simhash"),
          size(col("ashingles")).cast("long").as("n_audio_shingles"))
        .join(tsh, "clip_id")
        .select(col("clip_id"), col("sha"), col("simhash"),
          col("n_text_shingles"), col("n_audio_shingles"))
        .orderBy("clip_id")
    },
    None)

  /** Incremental MERGE demo: index the first 2/3, merge the rest, return the
    * final cluster assignment (IncrementalSpec pins equality with a full
    * rebuild; rows-only check here). */
  val incremental = QueryDef(
    "clip_incremental_clusters",
    (spark, dir) => {
      import graft.pipeline.{DedupStore, IncrementalDedup}
      val n = math.min(clipCount(dir), 4000L) // merge path demo, not a bench
      val ccfg = CorpusConfig(seed = 42L, n = n)
      val store = new DedupStore(
        java.nio.file.Files.createTempDirectory("graft-incr").toString)
      val cut = n * 2 / 3
      val base = ClipCorpus.clips(spark, ccfg).toDF().filter(col("clip_id") <
        f"clip_$cut%08d")
      val delta = ClipCorpus.clips(spark, ccfg).toDF().filter(col("clip_id") >=
        f"clip_$cut%08d")
      IncrementalDedup.initialize(spark, base, DedupConfig.default, store)
      IncrementalDedup.merge(spark, delta, DedupConfig.default, store)
      store.clusters.read(spark).orderBy("clip_id")
    },
    None)

  /** Read-only query-by-example top-k search against a committed store
    * (reference improved_faiss_detector.py:522-556). Rows-only check here;
    * exactness (rank-1 originals, no false matches, no store mutation) is
    * pinned by SearchSpec. */
  val search = QueryDef(
    "clip_search",
    (spark, dir) => {
      import graft.pipeline.{ClipSearch, DedupStore, IncrementalDedup}
      val n = math.min(clipCount(dir), 2000L)
      val ccfg = CorpusConfig(seed = 42L, n = n)
      val store = new DedupStore(
        java.nio.file.Files.createTempDirectory("graft-searchq").toString)
      val clips = ClipCorpus.clips(spark, ccfg).toDF()
      IncrementalDedup.initialize(spark, clips, DedupConfig.default, store)
      val probes = clips.filter(col("clip_id") < f"clip_${50}%08d")
        .withColumn("clip_id", concat(lit("probe_"), col("clip_id")))
      ClipSearch.search(spark, probes, store, DedupConfig.default, k = 5)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("probe_id", "rank")
    },
    None)

  // ---- DuckDB-oracled pipeline-path queries ----
  // The synthesized audio corpus is invisible to DuckDB, so these run the
  // SAME pipeline code (DedupPipeline.signatures / exactEdges /
  // ConnectedComponents) over a clips table derived deterministically from
  // the driver's `documents` parquet: payload bytes = utf8(source|text),
  // transcript = text, with planted duplicate rows — dupa_* copies share
  // bytes AND transcript (s: + t: identity), dupb_* copies share only the
  // transcript (t: identity, different bytes) — exercising the tagged
  // two-key exact space for real. DuckDB rebuilds each stage with sha256 +
  // a recursive-CTE closure, so the identity, star-edge, and CC stages of
  // the flagship get full hash-level verification.

  /** Spark-side clips-from-documents table (see ClipsCte for the oracle). */
  private def docClips(spark: org.apache.spark.sql.SparkSession, dir: String) = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def shaped(idPrefix: String, payload: org.apache.spark.sql.Column,
               rows: org.apache.spark.sql.DataFrame) =
      rows.select(
        concat(lit(idPrefix), col("doc_id")).as("clip_id"),
        payload.as("payload"), col("text").as("transcript"))
    shaped("doc_", concat(col("source"), lit("|"), col("text")), docs)
      .unionByName(shaped("dupa_", concat(col("source"), lit("|"), col("text")),
        docs.filter(col("doc_id") % 7 === 0)))
      .unionByName(shaped("dupb_", concat(lit("alt|"), col("text")),
        docs.filter(col("doc_id") % 13 === 0)))
      .select(col("clip_id"),
        encode(col("payload"), "UTF-8").as("bytes"),
        lit(8000).as("sr_hz"),
        (length(col("payload")) / lit(16)).cast("int").as("dur_ms"),
        lit("pcm_s16le").as("codec"),
        col("transcript"))
  }

  private val ClipsCte =
    """clips AS (
      |  SELECT 'doc_' || doc_id AS clip_id, source || '|' || text AS payload, text AS transcript FROM documents
      |  UNION ALL
      |  SELECT 'dupa_' || doc_id, source || '|' || text, text FROM documents WHERE doc_id % 7 = 0
      |  UNION ALL
      |  SELECT 'dupb_' || doc_id, 'alt|' || text, text FROM documents WHERE doc_id % 13 = 0
      |)""".stripMargin

  private val SigCte =
    s"""$ClipsCte,
      |sig AS (SELECT clip_id, sha256(payload) AS sha,
      |               CASE WHEN length(transcript) > 0 THEN sha256(transcript) END AS t_hash
      |        FROM clips)""".stripMargin

  private val EdgeCtes =
    s"""$SigCte,
      |k AS (SELECT clip_id, 's:' || sha AS k FROM sig
      |      UNION ALL
      |      SELECT clip_id, 't:' || t_hash FROM sig WHERE t_hash IS NOT NULL),
      |h AS (SELECT k, min(clip_id) AS a, count(*) AS n FROM k GROUP BY k HAVING count(*) > 1),
      |e AS (SELECT DISTINCT h.a AS a, k.clip_id AS b FROM k JOIN h USING (k) WHERE k.clip_id <> h.a)""".stripMargin

  /** The pipeline's content-identity columns, hash-checked by DuckDB. */
  val sigHashes = QueryDef(
    "clip_sig_hashes",
    (spark, dir) =>
      DedupPipeline.signatures(spark, docClips(spark, dir), DedupConfig.default)
        .select(col("clip_id"), col("sha"), col("tHashExact").as("t_hash"))
        .orderBy("clip_id"),
    Some(s"""WITH $SigCte
      |SELECT clip_id, sha, t_hash FROM sig ORDER BY clip_id""".stripMargin))

  /** The signature stage's MinHash construction end-to-end under PORTABLE
    * hashes, hash-checked by DuckDB: the same word-n-gram shingle identity,
    * the same perm coefficients (Hashing.permCoeffs — the pipeline's tsig
    * coefficients, at its full numPerms=128), and the same min-fold, over
    * the docClips transcripts (planted dup rows included) — with md5-derived
    * gram hashes in place of the pipeline's rolling hash so DuckDB can
    * rebuild every permutation minimum from raw text (the q_minhash_sigs
    * portability argument, applied to the FLAGSHIP's own signature stage and
    * corpus; ShingleSpec pins the two gram-hash paths to the same shingle-set
    * structure, MinHashSpec pins the signature fold). */
  val textSigs = QueryDef(
    "clip_text_sigs",
    (spark, dir) => {
      import graft.functions.TextShingles
      import graft.operators.MinHasher
      val cfg = DedupConfig.default
      docClips(spark, dir).select(col("clip_id"),
        TextShingles.hashShingles(
          TextShingles.wordShingles(col("transcript"), cfg.textLshWordNgram),
          portable = true).as("sh"))
        .filter(size(col("sh")) > 0)
        .select(col("clip_id"),
          MinHasher.signatureUdf(cfg.numPerms, cfg.seed)(col("sh")).as("tsig"))
        .select(col("clip_id"), posexplode(col("tsig")).as(Seq("perm", "minh")))
        .select(col("clip_id"), col("perm").cast("long").as("perm"), col("minh"))
        .orderBy("clip_id", "perm")
    },
    Some {
      val cfg = DedupConfig.default
      val n = cfg.textLshWordNgram
      val coeffs = graft.functions.Hashing.permCoeffs(cfg.numPerms, cfg.seed)
      val permRows = coeffs.zipWithIndex
        .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
      val gram = (0 until n).map(o => s"toks[CAST(i AS INT) + $o]")
        .mkString(" || ' ' || ")
      s"""WITH $ClipsCte,
        |n AS (SELECT clip_id,
        |             string_split(trim(regexp_replace(lower(transcript), '\\s+', ' ', 'g')), ' ') AS toks
        |      FROM clips),
        |offs AS (SELECT clip_id, toks, unnest(range(1, len(toks) - ${n - 2})) AS i
        |         FROM n WHERE len(toks) >= $n),
        |grams AS (SELECT DISTINCT clip_id, $gram AS g FROM offs),
        |gh AS (SELECT clip_id, ${graft.functions.Hashing.md5Hash31Sql("g")} AS h FROM grams),
        |perms(perm, pa, pb) AS (SELECT * FROM (VALUES $permRows)),
        |sigs AS (SELECT clip_id, perm, min((pa * h + pb) % ${graft.functions.Hashing.P}) AS minh
        |         FROM gh, perms GROUP BY clip_id, perm)
        |SELECT clip_id, CAST(perm AS BIGINT) AS perm, minh FROM sigs
        |ORDER BY clip_id, perm""".stripMargin
    })

  /** The pipeline's exact-identity star edges, hash-checked by DuckDB. */
  val exactEdges = QueryDef(
    "clip_exact_edges",
    (spark, dir) =>
      DedupPipeline.exactEdges(
        DedupPipeline.signatures(spark, docClips(spark, dir), DedupConfig.default))
        .select("a", "b").orderBy("a", "b"),
    Some(s"""WITH $EdgeCtes
      |SELECT a, b FROM e ORDER BY a, b""".stripMargin))

  /** Connected components over the pipeline's exact edges, hash-checked by a
    * DuckDB recursive-CTE transitive closure (the q_cc_clusters pattern, on
    * the flagship's own edge stage). */
  val exactClusters = QueryDef(
    "clip_exact_clusters",
    (spark, dir) => {
      import graft.operators.ConnectedComponents
      val edges = DedupPipeline.exactEdges(
        DedupPipeline.signatures(spark, docClips(spark, dir), DedupConfig.default))
        .select("a", "b")
      ConnectedComponents.run(edges)
        .select(col("node"), col("component"))
        .orderBy("node")
    },
    Some(s"""WITH RECURSIVE $EdgeCtes,
      |sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
      |reach(n, m) AS (
      |  SELECT a, b FROM sym
      |  UNION
      |  SELECT r.n, s.b FROM reach r JOIN sym s ON r.m = s.a WHERE r.n != s.b
      |)
      |SELECT n AS node, least(n, min(m)) AS component FROM reach
      |GROUP BY n ORDER BY node""".stripMargin))

  // ---- text-verify stage of the flagship, hash-checked by DuckDB ----
  // The flagship's candidate generation is LSH (spec-pinned); its VERIFY
  // stage is exact and therefore oracle-able: char-gram Jaccard >= 0.6
  // (PairVerifier.jaccardLongJvm — the sorted-merge kernel every verified
  // text pair goes through) and the three-tier containment verify (24-gram
  // prefilter + exact longest-common-run >= 70). Run here over ALL id pairs
  // of a capped docClips slice so the oracle is exhaustive; gram hashes use
  // the portable md5 form so DuckDB reproduces even hash collisions.
  private val TextPairsCap = 500L

  private def docClipsCapped(spark: org.apache.spark.sql.SparkSession,
                             dir: String) = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < TextPairsCap)
    docs.select(concat(lit("doc_"), col("doc_id")).as("clip_id"),
        col("text").as("transcript"))
      .unionByName(docs.filter(col("doc_id") % 7 === 0)
        .select(concat(lit("dupa_"), col("doc_id")).as("clip_id"),
          col("text").as("transcript")))
      .unionByName(docs.filter(col("doc_id") % 13 === 0)
        .select(concat(lit("dupb_"), col("doc_id")).as("clip_id"),
          col("text").as("transcript")))
  }

  private val CappedClipsCte =
    s"""clips AS (
      |  SELECT 'doc_' || doc_id AS clip_id, text AS transcript FROM documents
      |  WHERE doc_id < $TextPairsCap
      |  UNION ALL
      |  SELECT 'dupa_' || doc_id, text FROM documents
      |  WHERE doc_id % 7 = 0 AND doc_id < $TextPairsCap
      |  UNION ALL
      |  SELECT 'dupb_' || doc_id, text FROM documents
      |  WHERE doc_id % 13 = 0 AND doc_id < $TextPairsCap
      |)""".stripMargin

  val textPairs = QueryDef(
    "clip_text_pairs",
    (spark, dir) => {
      import graft.functions.TextShingles
      import graft.operators.{ContainmentJoin, PairVerifier}
      val cfg = DedupConfig.default
      val clipsT = docClipsCapped(spark, dir)
        .select(col("clip_id"), lower(col("transcript")).as("t"))
        .localCheckpoint(eager = false) // feeds ids + both verify features
      val ids = clipsT.select("clip_id")
      val cands = ids.select(col("clip_id").as("a"))
        .join(ids.select(col("clip_id").as("b")), col("a") < col("b"))
      val tsh = clipsT.select(col("clip_id"),
        TextShingles.hashShingles(
          TextShingles.charShingles(col("t"), cfg.charGramK),
          portable = true).as("tshingles"))
      val jacc = PairVerifier.verify(cands, tsh, "clip_id", "tshingles",
        cfg.textJaccardThreshold, "text_minhash")
      val w = cfg.containmentMinRun - ContainmentJoin.GramK + 1
      val txt = clipsT.select(col("clip_id"), col("t"),
        ContainmentJoin.gramsUdf(col("t")).as("_g"))
      val contain = cands
        .join(txt.select(col("clip_id").as("a"), col("t").as("_ta"),
          col("_g").as("_ga")), "a")
        .join(txt.select(col("clip_id").as("b"), col("t").as("_tb"),
          col("_g").as("_gb")), "b")
        .filter(ContainmentJoin.sharedUdf(col("_ga"), col("_gb")) >= w)
        .filter(ContainmentJoin.lcrUdf(col("_ta"), col("_tb")) >=
          cfg.containmentMinRun)
        .select(col("a"), col("b"), lit(0.9).as("score"),
          lit("containment").as("method"))
      jacc.unionByName(contain).orderBy("a", "b", "method")
    },
    Some {
      val cfg = DedupConfig.default
      val k = cfg.charGramK
      s"""WITH $CappedClipsCte,
        |t AS (SELECT clip_id, lower(transcript) AS t FROM clips),
        |offs AS (SELECT clip_id, t, unnest(range(1, length(t) - ${k - 2})) AS i
        |         FROM t WHERE length(t) >= $k),
        |grams AS (SELECT DISTINCT clip_id,
        |                 ${graft.functions.Hashing.md5Hash31Sql(s"substr(t, CAST(i AS INT), $k)")} AS h
        |          FROM offs),
        |cnt AS (SELECT clip_id, count(*) AS n FROM grams GROUP BY clip_id),
        |inter AS (SELECT x.clip_id AS a, y.clip_id AS b, count(*) AS i
        |          FROM grams x JOIN grams y ON x.h = y.h AND x.clip_id < y.clip_id
        |          GROUP BY 1, 2),
        |jac AS (SELECT a, b, CAST(i AS DOUBLE) / (ca.n + cb.n - i) AS score,
        |               'text_minhash' AS method
        |        FROM inter JOIN cnt ca ON a = ca.clip_id JOIN cnt cb ON b = cb.clip_id
        |        WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= ${cfg.textJaccardThreshold}),
        |r70 AS (SELECT clip_id, t, unnest(range(1, length(t) - ${cfg.containmentMinRun - 2})) AS i
        |        FROM t WHERE length(t) >= ${cfg.containmentMinRun}),
        |g70 AS (SELECT DISTINCT clip_id,
        |               substr(t, CAST(i AS INT), ${cfg.containmentMinRun}) AS g
        |        FROM r70),
        |cont AS (SELECT DISTINCT x.clip_id AS a, y.clip_id AS b,
        |                CAST(0.9 AS DOUBLE) AS score, 'containment' AS method
        |         FROM g70 x JOIN g70 y ON x.g = y.g AND x.clip_id < y.clip_id)
        |SELECT a, b, score, method FROM jac
        |UNION ALL
        |SELECT a, b, score, method FROM cont
        |ORDER BY a, b, method""".stripMargin
    })

  // ---- text-tier search against a committed store, hash-checked by DuckDB --
  // The search path's probabilistic tiers are inerted by config (an audio
  // estimate floor > 1 kills the audio verify before any PCM work; a text
  // jaccard threshold > 1 filters every LSH-collided pair), leaving the two
  // DETERMINISTIC tiers: exact identity (tagged s:/t: sha256 keys probed
  // against the stored key index) and containment (winnowing-fingerprint
  // candidates + three-tier verify). Both are DuckDB-expressible — exact via
  // sha256, containment EXHAUSTIVELY via a distinct 70-gram equi-join: the
  // winnowing guarantee (property-tested in OperatorSpec) makes fingerprint
  // collision a necessary condition for any shared run >= minRun, the exact
  // LCR confirm discards every false collision, and the fingerprint-bucket
  // cap is lifted so no candidate is dropped. This pins, end-to-end against
  // an independent oracle: store build, value-bucketed key/fp index probing,
  // bucket-pruned reads, the containment verify, best-method resolution
  // (exact 1.0 outranks containment 0.9), and per-probe top-k ranking. The
  // jaccard/audio scoring tiers of the same path stay spec-pinned
  // (SearchSpec).
  private val SearchK = 5

  val textSearch = QueryDef(
    "clip_text_search",
    (spark, dir) => {
      import graft.pipeline.{ClipSearch, DedupStore, IncrementalDedup}
      val cfg = DedupConfig.default.copy(
        audioEstimateMin = 2.0, // > 1: the audio tier can never pass
        textJaccardThreshold = 1.01, // > 1: the text tier can never pass
        containmentMaxBucket = Int.MaxValue) // oracle allows no dropped buckets
      val store = new DedupStore(
        java.nio.file.Files.createTempDirectory("graft-textsearch").toString)
      val clips = docClips(spark, dir)
      IncrementalDedup.initialize(spark,
        clips.filter(col("clip_id").startsWith("doc_")), cfg, store)
      ClipSearch.search(spark,
        clips.filter(!col("clip_id").startsWith("doc_")), store, cfg,
        k = SearchK)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("probe_id", "rank")
    },
    Some {
      val minRun = DedupConfig.default.containmentMinRun
      s"""WITH $ClipsCte,
        |stored AS (SELECT * FROM clips WHERE clip_id LIKE 'doc!_%' ESCAPE '!'),
        |probes AS (SELECT * FROM clips WHERE clip_id NOT LIKE 'doc!_%' ESCAPE '!'),
        |pk AS (SELECT clip_id, 's:' || sha256(payload) AS k FROM probes
        |       UNION ALL
        |       SELECT clip_id, 't:' || sha256(transcript) FROM probes
        |       WHERE length(transcript) > 0),
        |sk AS (SELECT clip_id, 's:' || sha256(payload) AS k FROM stored
        |       UNION ALL
        |       SELECT clip_id, 't:' || sha256(transcript) FROM stored
        |       WHERE length(transcript) > 0),
        |ex AS (SELECT DISTINCT pk.clip_id AS probe_id, sk.clip_id AS match_id,
        |              CAST(1.0 AS DOUBLE) AS score, 'exact' AS method
        |       FROM pk JOIN sk USING (k)),
        |pt AS (SELECT clip_id, lower(transcript) AS t FROM probes),
        |st AS (SELECT clip_id, lower(transcript) AS t FROM stored),
        |pg AS (SELECT DISTINCT clip_id, substr(t, CAST(i AS INT), $minRun) AS g
        |       FROM (SELECT clip_id, t,
        |                    unnest(range(1, length(t) - ${minRun - 2})) AS i
        |             FROM pt WHERE length(t) >= $minRun)),
        |sg AS (SELECT DISTINCT clip_id, substr(t, CAST(i AS INT), $minRun) AS g
        |       FROM (SELECT clip_id, t,
        |                    unnest(range(1, length(t) - ${minRun - 2})) AS i
        |             FROM st WHERE length(t) >= $minRun)),
        |cont AS (SELECT DISTINCT pg.clip_id AS probe_id, sg.clip_id AS match_id,
        |                CAST(0.9 AS DOUBLE) AS score, 'containment' AS method
        |         FROM pg JOIN sg ON pg.g = sg.g),
        |u AS (SELECT * FROM ex UNION ALL SELECT * FROM cont),
        |best AS (SELECT probe_id, match_id, score, method,
        |                row_number() OVER (PARTITION BY probe_id, match_id
        |                                   ORDER BY score DESC) AS mrk
        |         FROM u),
        |ranked AS (SELECT probe_id, match_id, score, method,
        |                  row_number() OVER (PARTITION BY probe_id
        |                                     ORDER BY score DESC, match_id) AS rank
        |           FROM best WHERE mrk = 1)
        |SELECT probe_id, match_id, score, method, rank FROM ranked
        |WHERE rank <= $SearchK ORDER BY probe_id, rank""".stripMargin
    })

  // ---- incremental MERGE path, hash-checked by DuckDB ----------------------
  // Same inerting trick as clip_text_search, applied to the WRITE path: with
  // the probabilistic tiers config-dead, a store's final cluster table is a
  // pure function of corpus content — the connected components (min-id
  // labels, singletons = own id) of the graph whose edges are exact identity
  // (shared tagged s:/t: sha256 key) and containment (shared run >= minRun,
  // = shared 70-gram). Three generations exercise the machinery for real:
  //   1. initialize with the doc_ clips (batch build: star edges + exhaustive
  //      containment join);
  //   2. merge the dupa_/dupb_ wave — new ids joining STORED exact groups
  //      through bucket-pruned key-index probes (E1 edges) plus delta-delta
  //      and delta-stored containment through fp-index probes;
  //   3. merge an UPDATE wave — every doc_id % 10 == 0 re-ingested with
  //      'upd|'-prefixed content: change detection flags them, their old key
  //      and fp index rows are invalidated, their exact stars BREAK (the doc_
  //      id was each group's min/center), survivors re-star (E2) with
  //      promoted-center re-probing, and the updated text containment-links
  //      back to its old copies (the 'upd|' prefix preserves every >= 70-run).
  // The DuckDB oracle knows nothing of merges: it computes the closure over
  // the FINAL corpus content directly, so hash equality proves the
  // merge==rebuild invariant (IncrementalSpec's pin) against an independent
  // engine, end-to-end through change detection, index invalidation, star
  // repair, bucket-pruned reads, and the clusters/mirror commit tail.
  private val IncrClipsCte =
    """clips AS (
      |  SELECT 'doc_' || doc_id AS clip_id,
      |         CASE WHEN doc_id % 10 = 0 THEN 'upd|' || source || '|' || text
      |              ELSE source || '|' || text END AS payload,
      |         CASE WHEN doc_id % 10 = 0 THEN 'upd|' || text
      |              ELSE text END AS transcript
      |  FROM documents
      |  UNION ALL
      |  SELECT 'dupa_' || doc_id, source || '|' || text, text FROM documents
      |  WHERE doc_id % 7 = 0
      |  UNION ALL
      |  SELECT 'dupb_' || doc_id, 'alt|' || text, text FROM documents
      |  WHERE doc_id % 13 = 0
      |)""".stripMargin

  /** The config with every probabilistic tier dead — store state becomes a
    * pure function of corpus content (see clip_text_search). */
  private def inertedCfg = DedupConfig.default.copy(
    audioEstimateMin = 2.0, // > 1: the audio tier can never pass
    textJaccardThreshold = 1.01, // > 1: the text tier can never pass
    containmentMaxBucket = Int.MaxValue) // oracle allows no dropped buckets

  /** The update wave: every doc_id % 10 == 0 re-ingested with 'upd|'-prefixed
    * content (mirrors IncrClipsCte's CASE branch). */
  private def updatedDocClips(spark: org.apache.spark.sql.SparkSession,
                              dir: String) =
    spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 10 === 0)
      .select(concat(lit("doc_"), col("doc_id")).as("clip_id"),
        concat(lit("upd|"), col("source"), lit("|"), col("text")).as("payload"),
        concat(lit("upd|"), col("text")).as("transcript"))
      .select(col("clip_id"),
        encode(col("payload"), "UTF-8").as("bytes"),
        lit(8000).as("sr_hz"),
        (length(col("payload")) / lit(16)).cast("int").as("dur_ms"),
        lit("pcm_s16le").as("codec"),
        col("transcript"))

  /** Closure over the FINAL corpus content: exact (shared tagged key) and
    * containment (shared 70-gram) edges, min-id component labels, singletons
    * own id — what the store's clusters table must equal after ANY sequence
    * of merges covering the same content (merge==rebuild). */
  private val IncrClosureSql = {
    val minRun = DedupConfig.default.containmentMinRun
    s"""WITH RECURSIVE $IncrClipsCte,
      |k AS (SELECT clip_id, 's:' || sha256(payload) AS k FROM clips
      |      UNION ALL
      |      SELECT clip_id, 't:' || sha256(transcript) FROM clips
      |      WHERE length(transcript) > 0),
      |h AS (SELECT k, min(clip_id) AS a FROM k GROUP BY k HAVING count(*) > 1),
      |ex AS (SELECT DISTINCT h.a AS a, k.clip_id AS b FROM k JOIN h USING (k)
      |       WHERE k.clip_id <> h.a),
      |t AS (SELECT clip_id, lower(transcript) AS t FROM clips),
      |g70 AS (SELECT DISTINCT clip_id, substr(t, CAST(i AS INT), $minRun) AS g
      |        FROM (SELECT clip_id, t,
      |                     unnest(range(1, length(t) - ${minRun - 2})) AS i
      |              FROM t WHERE length(t) >= $minRun)),
      |cont AS (SELECT DISTINCT x.clip_id AS a, y.clip_id AS b
      |         FROM g70 x JOIN g70 y ON x.g = y.g AND x.clip_id < y.clip_id),
      |e AS (SELECT a, b FROM ex UNION SELECT a, b FROM cont),
      |sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
      |reach(n, m) AS (
      |  SELECT a, b FROM sym
      |  UNION
      |  SELECT r.n, s.b FROM reach r JOIN sym s ON r.m = s.a WHERE r.n != s.b
      |),
      |comp AS (SELECT n, least(n, min(m)) AS component FROM reach GROUP BY n)
      |SELECT c.clip_id, coalesce(comp.component, c.clip_id) AS component
      |FROM clips c LEFT JOIN comp ON c.clip_id = comp.n
      |ORDER BY clip_id""".stripMargin
  }

  val textIncremental = QueryDef(
    "clip_text_incremental",
    (spark, dir) => {
      import graft.pipeline.{DedupStore, IncrementalDedup}
      val cfg = inertedCfg
      val store = new DedupStore(
        java.nio.file.Files.createTempDirectory("graft-textincr").toString)
      val clips = docClips(spark, dir)
      IncrementalDedup.initialize(spark,
        clips.filter(col("clip_id").startsWith("doc_")), cfg, store)
      IncrementalDedup.merge(spark,
        clips.filter(!col("clip_id").startsWith("doc_")), cfg, store)
      IncrementalDedup.merge(spark, updatedDocClips(spark, dir), cfg, store)
      store.clusters.read(spark)
        .select("clip_id", "component").orderBy("clip_id")
    },
    Some(IncrClosureSql))

  // ---- Structured Streaming ingest, hash-checked by the SAME closure ------
  // The dup wave and the update wave arrive as two files of a streaming
  // parquet source (maxFilesPerTrigger=1 -> one foreachBatch MERGE per file,
  // StreamingMerge.attach — the §2.10 front door with its checkpointLocation
  // and exactly-once-on-replay snapshots). merge==rebuild makes the final
  // clusters table independent of batch boundaries and arrival order, so the
  // identical DuckDB closure must hash-match: the streaming path gets the
  // same independent-engine verification as the batch and incremental paths.
  val textStreaming = QueryDef(
    "clip_text_streaming",
    (spark, dir) => {
      import graft.pipeline.{DedupStore, IncrementalDedup}
      import graft.streaming.StreamingMerge
      val cfg = inertedCfg
      val tmp = java.nio.file.Files.createTempDirectory("graft-textstream")
      val store = new DedupStore(s"$tmp/store")
      val clips = docClips(spark, dir)
      IncrementalDedup.initialize(spark,
        clips.filter(col("clip_id").startsWith("doc_")), cfg, store)
      val in = s"$tmp/in"
      clips.filter(!col("clip_id").startsWith("doc_"))
        .coalesce(1).write.mode("append").parquet(in)
      updatedDocClips(spark, dir)
        .coalesce(1).write.mode("append").parquet(in)
      val q = StreamingMerge.attach(
        spark.readStream.schema(clips.schema)
          .option("maxFilesPerTrigger", 1).parquet(in),
        store, cfg, s"$tmp/ckpt")
      q.processAllAvailable()
      q.stop()
      store.clusters.read(spark)
        .select("clip_id", "component").orderBy("clip_id")
    },
    Some(IncrClosureSql))

  val all: Seq[QueryDef] = Seq(clusters, dupPairs, signatures, incremental,
    search, sigHashes, textSigs, exactEdges, exactClusters, textPairs,
    textSearch, textIncremental, textStreaming)
}
