package graft.queries

import graft.config.DedupConfig
import graft.functions.{Hashing, SimHash, TextShingles}
import graft.operators.{ConnectedComponents, ContainmentJoin, LshCandidates, MinHasher, SuffixArray}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deduplication operators over the `documents` table, each with an exact
 * DuckDB oracle: exact-hash dedup, n-gram Jaccard similarity join, SimHash,
 * MinHash signatures + LSH band candidate pairs, winnowing containment
 * fingerprints, and connected-components clustering.
 *
 * These are the same operators the clip pipeline runs (graft.pipeline), here
 * instantiated with PORTABLE md5-derived hashes (graft.functions.Hashing) so
 * every intermediate value is bit-for-bit reproducible in ANSI SQL — the
 * driver's DuckDB compare recomputes signatures, band keys, and cluster
 * labels from scratch.
 *
 * Reference semantics: exact-dup guard (bert_similarity.py:105-113), Jaccard
 * (utils/distance.py:129-134), SimHash (literal_similarity.py:88-117),
 * all-pairs mining (utils/util.py:170-234), community detection
 * (utils/util.py:237-305).
 *
 * Brute-force-shaped queries cap input at doc_id < BruteCap: they are oracle
 * demonstrations of the exact metric; the scale path is LSH (the band-pairs
 * query + the clip pipeline).
 */
object TextDedup {
  val BruteCap = 2000L
  val K = 5 // char-gram width
  val MinhashPerms = 32
  val LshBands = 8
  val LshRows = 4
  private val cfg = DedupConfig.default
  private val P = Hashing.P

  // ---------- shared Spark-side builders ----------

  private def normedDocs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), Tables.normText(col("text")).as("t"))

  /** (doc_id, g) distinct char K-grams, portable hashing NOT applied. */
  private def charGramSets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(TextShingles.charShingles(col("t"), K)).as("g"))

  /** Exact Jaccard pairs over a (doc_id, g) shingle relation. */
  private def jaccardPairs(shinglesIn: DataFrame, threshold: Double): DataFrame = {
    // checkpoint: the shingle relation feeds the count agg AND both sides of
    // the self-join — three recomputes of the gram pipeline otherwise
    val shingles = shinglesIn.localCheckpoint(eager = false)
    val counts = shingles.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = shingles.select(col("doc_id").as("a"), col("g"))
      .join(shingles.select(col("doc_id").as("b"), col("g")), "g")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("i"))
    inter
      .join(counts.select(col("doc_id").as("a"), col("n").as("na")), "a")
      .join(counts.select(col("doc_id").as("b"), col("n").as("nb")), "b")
      .select(col("a"), col("b"),
        (col("i").cast("double") / (col("na") + col("nb") - col("i"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ---------- shared DuckDB-side SQL fragments ----------

  /** CTE list producing `grams(doc_id, g)` distinct char K-grams of the
    * normalized text (optionally capped), matching charGramSets. */
  private def gramCtes(cap: Boolean): String = {
    val capSql = if (cap) s"WHERE doc_id < $BruteCap" else ""
    s"""n AS (SELECT doc_id, ${Tables.NormSql} AS t FROM documents $capSql),
       |offs AS (SELECT doc_id, t, unnest(range(1, length(t) - ${K - 2})) AS i
       |         FROM n WHERE length(t) >= $K),
       |grams AS (SELECT DISTINCT doc_id, substr(t, CAST(i AS INT), $K) AS g FROM offs)""".stripMargin
  }

  /** CTEs from `grams` to `jac(a, b, jaccard)` with the given threshold. */
  private def jaccardCtes(threshold: Double): String =
    s"""cnt AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
       |inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
       |          FROM grams x JOIN grams y ON x.g = y.g AND x.doc_id < y.doc_id
       |          GROUP BY 1, 2),
       |jac AS (SELECT a, b, CAST(i AS DOUBLE) / (ca.n + cb.n - i) AS jaccard
       |        FROM inter JOIN cnt ca ON a = ca.doc_id JOIN cnt cb ON b = cb.doc_id
       |        WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= $threshold)""".stripMargin

  // ---------- queries ----------

  /** Exact dedup: every doc labeled with its content-hash group rep + size. */
  val exactDedup = QueryDef(
    "q_exact_dedup",
    (spark, dir) => {
      val w = Window.partitionBy("h")
      normedDocs(spark, dir)
        .select(col("doc_id"), md5(col("t")).as("h"))
        .select(col("doc_id"),
          min(col("doc_id")).over(w).as("rep_id"),
          count(lit(1)).over(w).cast("long").as("group_n"))
        .orderBy("doc_id")
    },
    Some(s"""WITH n AS (SELECT doc_id, md5(${Tables.NormSql}) AS h FROM documents)
      |SELECT doc_id, min(doc_id) OVER (PARTITION BY h) AS rep_id,
      |       count(*) OVER (PARTITION BY h) AS group_n
      |FROM n ORDER BY doc_id""".stripMargin))

  /** Char 5-gram exact Jaccard similarity join (>= 0.6). */
  val jaccardDupPairs = QueryDef(
    "q_jaccard_dup_pairs",
    (spark, dir) => {
      val docs = normedDocs(spark, dir).filter(col("doc_id") < BruteCap)
      jaccardPairs(charGramSets(docs), 0.6).orderBy("a", "b")
    },
    Some(s"""WITH ${gramCtes(cap = true)},
      |${jaccardCtes(0.6)}
      |SELECT a, b, jaccard FROM jac ORDER BY a, b""".stripMargin))

  /** Word-bigram Jaccard similarity join (>= 0.5) — the token-level n-gram
    * variant. */
  val wordNgramJaccardPairs = QueryDef(
    "q_word2gram_jaccard_pairs",
    (spark, dir) => {
      val docs = normedDocs(spark, dir).filter(col("doc_id") < BruteCap)
      val sh = docs.select(col("doc_id"),
        explode(TextShingles.wordShingles(col("t"), 2)).as("g"))
      jaccardPairs(sh, 0.5).orderBy("a", "b")
    },
    Some(s"""WITH n AS (SELECT doc_id, string_split(${Tables.NormSql}, ' ') AS toks
      |         FROM documents WHERE doc_id < $BruteCap),
      |offs AS (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM n WHERE len(toks) >= 2),
      |grams AS (SELECT DISTINCT doc_id, toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1] AS g FROM offs),
      |${jaccardCtes(0.5)}
      |SELECT a, b, jaccard FROM jac ORDER BY a, b""".stripMargin))

  /** Per-doc 60-bit SimHash signature. */
  val simhashSigs = QueryDef(
    "q_simhash",
    (spark, dir) =>
      Tables.documents(spark, dir)
        .select(col("doc_id"), SimHash.simhash(spark, col("text")).as("simhash"))
        .orderBy("doc_id"),
    Some(s"""SELECT sid AS doc_id, simhash FROM (
      |${SimHash.oracleSql("doc_id", "text", "documents")}
      |) ORDER BY doc_id""".stripMargin))

  /** Brute-force SimHash near-dup pairs (hamming sim >= 0.85). */
  val simhashNearPairs = QueryDef(
    "q_simhash_near_pairs",
    (spark, dir) => {
      val sigs = Tables.documents(spark, dir)
        .filter(col("doc_id") < BruteCap)
        .select(col("doc_id"), SimHash.simhash(spark, col("text")).as("s"))
      val a = sigs.select(col("doc_id").as("a"), col("s").as("sa"))
      val b = sigs.select(col("doc_id").as("b"), col("s").as("sb"))
      a.join(b, col("a") < col("b"))
        .select(col("a"), col("b"), SimHash.hammingSim(col("sa"), col("sb")).as("hsim"))
        .filter(col("hsim") >= 0.85)
        .orderBy("a", "b")
    },
    Some(s"""WITH sims AS (
      |${SimHash.oracleSql("doc_id", "text", s"(SELECT * FROM documents WHERE doc_id < $BruteCap) dd")}
      |)
      |SELECT x.sid AS a, y.sid AS b,
      |       1 - CAST(bit_count(xor(x.simhash, y.simhash)) AS DOUBLE) / ${SimHash.Bits} AS hsim
      |FROM sims x JOIN sims y ON x.sid < y.sid
      |WHERE 1 - CAST(bit_count(xor(x.simhash, y.simhash)) AS DOUBLE) / ${SimHash.Bits} >= 0.85
      |ORDER BY a, b""".stripMargin))

  /** Portable MinHash signatures via the row-local UDF — bit-identical to
    * the declarative explode+groupBy plan (MinHashSpec pins the parity) but
    * shuffle-free; the DuckDB oracle recomputes the same minima from text. */
  private def portableSigs(spark: SparkSession, dir: String): DataFrame = {
    val docs = normedDocs(spark, dir)
    val hashed = docs.select(col("doc_id"),
      TextShingles.hashShingles(
        TextShingles.charShingles(col("t"), K), portable = true).as("sh"))
    hashed.filter(size(col("sh")) > 0)
      .select(col("doc_id"),
        MinHasher.signatureUdf(MinhashPerms, cfg.seed)(col("sh")).as("sig"))
  }

  private def minhashCtes(cap: Boolean): String = {
    val coeffs = Hashing.permCoeffs(MinhashPerms, cfg.seed)
    val permRows = coeffs.zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
    s"""${gramCtes(cap)},
       |gh AS (SELECT doc_id, ${Hashing.md5Hash31Sql("g")} AS h FROM grams),
       |perms(perm, pa, pb) AS (SELECT * FROM (VALUES $permRows)),
       |sigs AS (SELECT doc_id, perm, min((pa * h + pb) % $P) AS minh
       |         FROM gh, perms GROUP BY doc_id, perm)""".stripMargin
  }

  /** MinHash signatures, exploded to (doc_id, perm, minh) — the DuckDB
    * oracle recomputes every permutation minimum from raw text. */
  val minhashSigs = QueryDef(
    "q_minhash_sigs",
    (spark, dir) =>
      portableSigs(spark, dir)
        .select(col("doc_id"), posexplode(col("sig")).as(Seq("perm", "minh")))
        .select(col("doc_id"), col("perm").cast("long").as("perm"), col("minh"))
        .orderBy("doc_id", "perm"),
    Some(s"""WITH ${minhashCtes(cap = false)}
      |SELECT doc_id, CAST(perm AS BIGINT) AS perm, minh FROM sigs
      |ORDER BY doc_id, perm""".stripMargin))

  /** LSH band-bucket candidate pairs (b=8, r=4) from the MinHash signatures —
    * the scalable candidate-generation plan, bucket keys reproduced exactly
    * by the oracle. */
  val lshBandPairs = QueryDef(
    "q_lsh_band_pairs",
    (spark, dir) => {
      // checkpoint: the band keys feed BOTH sides of the self-join; without
      // it the whole shingle+signature pipeline runs twice
      val keys = LshCandidates.bandKeys(portableSigs(spark, dir), "doc_id", LshBands, LshRows)
        .localCheckpoint(eager = false)
      keys.select(col("doc_id").as("a"), col("band"), col("bandVal"))
        .join(keys.select(col("doc_id").as("b"), col("band"), col("bandVal")),
          Seq("band", "bandVal"))
        .filter(col("a") < col("b"))
        .select("a", "b").distinct()
        .orderBy("a", "b")
    },
    Some(s"""WITH ${minhashCtes(cap = false)},
      |bands AS (SELECT doc_id, perm // $LshRows AS band,
      |                 string_agg(CAST(minh AS VARCHAR), ',' ORDER BY perm) AS bv
      |          FROM sigs GROUP BY doc_id, perm // $LshRows)
      |SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      |FROM bands x JOIN bands y ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id
      |ORDER BY a, b""".stripMargin))

  /** Winnowing containment fingerprints (k = ContainmentJoin.GramK,
    * window = min-run 70). */
  val containmentFps = QueryDef(
    "q_containment_fp",
    (spark, dir) =>
      ContainmentJoin.fingerprints(
        normedDocs(spark, dir), "doc_id", "t", cfg.containmentMinRun, portable = true)
        .orderBy("doc_id", "fp"),
    Some {
      val k = ContainmentJoin.GramK
      val w = cfg.containmentMinRun - k + 1
      s"""WITH n AS (SELECT doc_id, ${Tables.NormSql} AS t FROM documents),
        |offs AS (SELECT doc_id, t, unnest(range(1, length(t) - ${k - 2})) AS i
        |         FROM n WHERE length(t) >= ${cfg.containmentMinRun}),
        |grams AS (SELECT doc_id, i, ${Hashing.md5Hash60Sql(s"substr(t, CAST(i AS INT), $k)")} AS gh FROM offs),
        |win AS (SELECT doc_id, i,
        |               min(gh) OVER (PARTITION BY doc_id ORDER BY i
        |                             ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS fp,
        |               count(*) OVER (PARTITION BY doc_id) AS ng
        |        FROM grams)
        |SELECT DISTINCT doc_id, fp FROM win WHERE i <= ng - ${w - 1}
        |ORDER BY doc_id, fp""".stripMargin
    })

  /** Generalized suffix array (distributed prefix doubling) over a capped
    * subset — the oracle materializes every suffix STRING and sorts them
    * (O(total²) bytes), so it is capped like the brute-shaped queries; the
    * Spark side is the scale-path construction (SuffixArray.suffixArray). */
  val SaCap = 40L
  val suffixArrayQ = QueryDef(
    "q_suffix_array",
    (spark, dir) =>
      SuffixArray.suffixArray(
          normedDocs(spark, dir).filter(col("doc_id") < SaCap), "doc_id", "t")
        .select(col("_id").as("doc_id"),
          (col("_pos") + lit(1L)).as("pos"), col("sa_pos"))
        .orderBy("doc_id", "pos"),
    Some(s"""WITH n AS (SELECT doc_id, ${Tables.NormSql} AS t FROM documents
      |         WHERE doc_id < $SaCap),
      |offs AS (SELECT doc_id, t, unnest(range(1, length(t) + 1)) AS i
      |         FROM n WHERE length(t) >= 1),
      |sfx AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
      |               substr(t, CAST(i AS INT)) AS s FROM offs)
      |SELECT doc_id, pos, row_number() OVER (ORDER BY s, doc_id, pos) AS sa_pos
      |FROM sfx ORDER BY doc_id, pos""".stripMargin))

  /** LCP array over the same capped subset: for every suffix, the longest
    * common prefix with its SA predecessor — the classic SA companion
    * (adjacent-LCP >= L runs are exactly the shared-substring witnesses).
    * Oracle: brute suffix sort + a bounded-k prefix-equality scan (LcpMaxLen
    * must exceed every suffix length at the capped subset; docs are
    * ~300-600 chars). */
  val LcpMaxLen = 1000
  private val suffixLcpSql =
    s"""WITH n AS (SELECT doc_id, ${Tables.NormSql} AS t FROM documents
      |         WHERE doc_id < $SaCap),
      |offs AS (SELECT doc_id, t, unnest(range(1, length(t) + 1)) AS i
      |         FROM n WHERE length(t) >= 1),
      |sfx AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
      |               substr(t, CAST(i AS INT)) AS s,
      |               row_number() OVER (ORDER BY substr(t, CAST(i AS INT)), doc_id, i) AS sa_pos
      |        FROM offs),
      |lcpj AS (SELECT cur.sa_pos AS sp, max(t.k) AS lcp
      |         FROM sfx cur JOIN sfx prv ON prv.sa_pos = cur.sa_pos - 1
      |         CROSS JOIN range(0, ${LcpMaxLen + 1}) t(k)
      |         WHERE t.k <= least(length(cur.s), length(prv.s))
      |           AND substr(cur.s, 1, CAST(t.k AS INT)) = substr(prv.s, 1, CAST(t.k AS INT))
      |         GROUP BY cur.sa_pos)
      |SELECT cur.doc_id, cur.pos, cur.sa_pos, COALESCE(l.lcp, 0) AS lcp
      |FROM sfx cur LEFT JOIN lcpj l ON l.sp = cur.sa_pos
      |ORDER BY cur.doc_id, cur.pos""".stripMargin

  val suffixLcpQ = QueryDef(
    "q_suffix_lcp",
    (spark, dir) =>
      SuffixArray.lcpArray(
          normedDocs(spark, dir).filter(col("doc_id") < SaCap), "doc_id", "t")
        .select(col("_id").as("doc_id"),
          (col("_pos") + lit(1L)).as("pos"), col("sa_pos"), col("lcp"))
        .orderBy("doc_id", "pos"),
    Some(suffixLcpSql))

  /** The SAME adjacent-LCP relation via the all-scale backend
    * (`lcpArrayScaled`: retained rank tables + binary-search descent as
    * O(log maxlen) equi-joins — no per-position text haul), checked against
    * the identical DuckDB oracle, so both LCP backends are independently
    * hash-pinned end-to-end. */
  val suffixLcpScaleQ = QueryDef(
    "q_suffix_lcp_scale",
    (spark, dir) =>
      SuffixArray.lcpArrayScaled(
          normedDocs(spark, dir).filter(col("doc_id") < SaCap), "doc_id", "t")
        .select(col("_id").as("doc_id"),
          (col("_pos") + lit(1L)).as("pos"), col("sa_pos"), col("lcp"))
        .orderBy("doc_id", "pos"),
    Some(suffixLcpSql))

  /** EXACT substring-dup pairs via the suffix-array pass (UNCAPPED — this is
    * the scale path): docs sharing a verbatim run >= containmentMinRun.
    * Oracle: a shared run of length >= L is equivalent to a shared L-gram,
    * which DuckDB can check by equi-joining all L-grams. */
  val suffixPairs = QueryDef(
    "q_suffix_pairs",
    (spark, dir) =>
      SuffixArray.substringPairs(
          normedDocs(spark, dir), "doc_id", "t", cfg.containmentMinRun)
        .orderBy("a", "b"),
    Some {
      val L = cfg.containmentMinRun
      s"""WITH n AS (SELECT doc_id, ${Tables.NormSql} AS t FROM documents),
        |offs AS (SELECT doc_id, t, unnest(range(1, length(t) - $L + 2)) AS i
        |         FROM n WHERE length(t) >= $L),
        |g AS (SELECT DISTINCT doc_id, substr(t, CAST(i AS INT), $L) AS gram FROM offs)
        |SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        |FROM g x JOIN g y ON x.gram = y.gram AND x.doc_id < y.doc_id
        |ORDER BY a, b""".stripMargin
    })

  /** Connected components over the >=0.6 Jaccard dup graph; oracle = DuckDB
    * recursive-CTE transitive closure. */
  val ccClusters = QueryDef(
    "q_cc_clusters",
    (spark, dir) => {
      val docs = normedDocs(spark, dir).filter(col("doc_id") < BruteCap)
      val edges = jaccardPairs(charGramSets(docs), 0.6).select("a", "b")
      ConnectedComponents.run(edges)
        .select(col("node"), col("component"))
        .orderBy("node")
    },
    Some(s"""WITH RECURSIVE ${gramCtes(cap = true)},
      |${jaccardCtes(0.6)},
      |sym AS (SELECT a, b FROM jac UNION SELECT b, a FROM jac),
      |reach(n, m) AS (
      |  SELECT a, b FROM sym
      |  UNION
      |  SELECT r.n, s.b FROM reach r JOIN sym s ON r.m = s.a WHERE r.n != s.b
      |)
      |SELECT n AS node, least(n, min(m)) AS component FROM reach
      |GROUP BY n ORDER BY node""".stripMargin))

  /** Cluster profile (W4): components of the >=0.6 Jaccard graph ordered by
    * size desc; the component label is the min member id (the centroid-first
    * convention of the reference's community output). */
  val clusterProfile = QueryDef(
    "q_cluster_profile",
    (spark, dir) => {
      val docs = normedDocs(spark, dir).filter(col("doc_id") < BruteCap)
      val edges = jaccardPairs(charGramSets(docs), 0.6).select("a", "b")
      ConnectedComponents.run(edges)
        .groupBy("component").agg(count(lit(1)).as("n_members"))
        .orderBy(col("n_members").desc, col("component"))
    },
    Some(s"""WITH RECURSIVE ${gramCtes(cap = true)},
      |${jaccardCtes(0.6)},
      |sym AS (SELECT a, b FROM jac UNION SELECT b, a FROM jac),
      |reach(n, m) AS (
      |  SELECT a, b FROM sym
      |  UNION
      |  SELECT r.n, s.b FROM reach r JOIN sym s ON r.m = s.a WHERE r.n != s.b
      |),
      |assign AS (SELECT n AS node, least(n, min(m)) AS component FROM reach GROUP BY n)
      |SELECT component, count(*) AS n_members FROM assign
      |GROUP BY component ORDER BY n_members DESC, component""".stripMargin))

  val all: Seq[QueryDef] = Seq(
    exactDedup, jaccardDupPairs, wordNgramJaccardPairs, simhashSigs,
    simhashNearPairs, minhashSigs, lshBandPairs, containmentFps,
    suffixArrayQ, suffixLcpQ, suffixLcpScaleQ, suffixPairs, ccClusters,
    clusterProfile)
}
