package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over the `embeddings` table (64-dim float vectors) —
 * the Spark re-expression of the reference's FAISS search surface:
 * brute-force exact cosine top-k (IndexFlatIP semantics,
 * improved_faiss_detector.py:297-317 + 522-556) and an IVF-bucketed variant
 * (the index type its autofaiss path would pick at scale,
 * faiss_bert_similarity.py:109-129): assign every vector to its nearest of
 * K centroids, then search only within the probe's bucket.
 *
 * All float math is built as LEFT-ASSOCIATIVE double chains in array-index
 * order on both sides (Spark `aggregate` folds left over the array; the
 * oracle SQL is a generated left-assoc `+` chain), so scores are
 * bit-identical — no rounding, no tolerance.
 */
object EmbeddingQueries {
  val Dim = 64
  val TopK = 5
  val NumCentroids = 16
  val QueryStride = 100 // probes = vec_id % QueryStride == 0

  // ---- Spark-side exact-fold vector math ----
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
  private def norm2(a: Column): Column =
    aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x)
  private def cosine(a: Column, na: Column, b: Column, nb: Column): Column =
    dot(a, b) / (sqrt(na) * sqrt(nb))

  // ---- oracle-side generated chains (same order, same casts) ----
  private def dotSql(a: String, b: String): String =
    (1 to Dim).map(i => s"CAST($a[$i] AS DOUBLE) * CAST($b[$i] AS DOUBLE)")
      .mkString("(", " + ", ")")
  private def norm2Sql(a: String): String = dotSql(a, a)
  private def cosineSql(a: String, na: String, b: String, nb: String): String =
    s"(${dotSql(a, b)}) / (sqrt($na) * sqrt($nb))"

  private def withNorm(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), norm2(col("embedding")).as("n2"))

  val embeddingNorms = QueryDef(
    "q_embedding_norms",
    (spark, dir) =>
      Tables.embeddings(spark, dir)
        .select(col("vec_id"), size(col("embedding")).cast("long").as("dim"),
          sqrt(norm2(col("embedding"))).as("l2"))
        .orderBy("vec_id"),
    Some(s"""SELECT vec_id, len(embedding) AS dim, sqrt(${norm2Sql("embedding")}) AS l2
      |FROM embeddings ORDER BY vec_id""".stripMargin))

  /** Brute-force exact cosine top-k for probe vectors (vec_id % $QueryStride
    * == 0) — the flat-index oracle every ANN variant is measured against. */
  val cosineTopk = QueryDef(
    "q_cosine_topk",
    (spark, dir) => {
      val vecs = withNorm(spark, dir)
      val q = vecs.filter(col("vec_id") % QueryStride === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("n2").as("qn"))
      val t = vecs.select(col("vec_id").as("vid"), col("embedding").as("te"), col("n2").as("tn"))
      broadcast(q).join(t, col("qid") =!= col("vid"))
        .select(col("qid"), col("vid"),
          cosine(col("qe"), col("qn"), col("te"), col("tn")).as("cos"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("qid").orderBy(col("cos").desc, col("vid"))))
        .filter(col("rk") <= TopK)
        .select(col("qid"), col("vid"), col("rk").cast("long").as("rk"), col("cos"))
        .orderBy("qid", "rk")
    },
    Some(s"""WITH v AS (SELECT vec_id, embedding, ${norm2Sql("embedding")} AS n2 FROM embeddings),
      |q AS (SELECT vec_id AS qid, embedding AS qe, n2 AS qn FROM v WHERE vec_id % $QueryStride = 0),
      |scored AS (
      |  SELECT qid, v.vec_id AS vid, ${cosineSql("qe", "qn", "v.embedding", "v.n2")} AS cos
      |  FROM q JOIN v ON qid != v.vec_id
      |), ranked AS (
      |  SELECT qid, vid, cos,
      |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rk
      |  FROM scored
      |)
      |SELECT qid, vid, rk, cos FROM ranked WHERE rk <= $TopK ORDER BY qid, rk""".stripMargin))

  /** IVF-bucketed approximate top-k: centroids = first $NumCentroids vectors;
    * every vector is assigned to its max-cosine centroid; each probe searches
    * only its own bucket. The scale path: the per-bucket join replaces the
    * full cross product with an equi-join on the centroid id. */
  val annIvf = QueryDef(
    "q_ann_ivf",
    (spark, dir) => {
      val vecs = withNorm(spark, dir)
      val cents = vecs.filter(col("vec_id") < NumCentroids)
        .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("n2").as("cn"))
      val assigned = vecs.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("embedding"), col("n2"), col("cid"),
          cosine(col("embedding"), col("n2"), col("ce"), col("cn")).as("ccos"))
        .withColumn("crk", row_number().over(
          Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cid"))))
        .filter(col("crk") === 1)
        .select(col("vec_id"), col("embedding"), col("n2"), col("cid"))
      val q = assigned.filter(col("vec_id") % QueryStride === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          col("n2").as("qn"), col("cid"))
      val t = assigned.select(col("vec_id").as("vid"), col("embedding").as("te"),
        col("n2").as("tn"), col("cid"))
      q.join(t, Seq("cid")).filter(col("qid") =!= col("vid"))
        .select(col("qid"), col("vid"),
          cosine(col("qe"), col("qn"), col("te"), col("tn")).as("cos"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("qid").orderBy(col("cos").desc, col("vid"))))
        .filter(col("rk") <= TopK)
        .select(col("qid"), col("vid"), col("rk").cast("long").as("rk"), col("cos"))
        .orderBy("qid", "rk")
    },
    Some(s"""WITH v AS (SELECT vec_id, embedding, ${norm2Sql("embedding")} AS n2 FROM embeddings),
      |c AS (SELECT vec_id AS cid, embedding AS ce, n2 AS cn FROM v WHERE vec_id < $NumCentroids),
      |ac AS (
      |  SELECT v.vec_id, v.embedding, v.n2, cid,
      |         row_number() OVER (PARTITION BY v.vec_id
      |                            ORDER BY ${cosineSql("v.embedding", "v.n2", "ce", "cn")} DESC, cid) AS crk
      |  FROM v CROSS JOIN c
      |), assigned AS (SELECT vec_id, embedding, n2, cid FROM ac WHERE crk = 1),
      |q AS (SELECT vec_id AS qid, embedding AS qe, n2 AS qn, cid FROM assigned
      |      WHERE vec_id % $QueryStride = 0),
      |scored AS (
      |  SELECT qid, t.vec_id AS vid, ${cosineSql("qe", "qn", "t.embedding", "t.n2")} AS cos
      |  FROM q JOIN assigned t USING (cid) WHERE qid != t.vec_id
      |), ranked AS (
      |  SELECT qid, vid, cos,
      |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rk
      |  FROM scored
      |)
      |SELECT qid, vid, rk, cos FROM ranked WHERE rk <= $TopK ORDER BY qid, rk""".stripMargin))

  // ---- real IVF quantizer: deterministic Lloyd k-means ----
  // The oracle query above seeds centroids with the first K vectors (fully
  // reproducible in SQL — a demo quantizer). This is the production path:
  // hash-spread deterministic init, `iters` Lloyd rounds, all DataFrame
  // aggregations (per-dimension mean via posexplode + groupBy — scales to
  // any corpus; k centroids broadcast). Graded by EvalSpec: recall@k vs the
  // exact scan must beat the first-K demo quantizer.
  def kmeansCentroids(vecs: DataFrame, k: Int, iters: Int): DataFrame = {
    var cents = vecs.orderBy(xxhash64(col("vec_id")))
      .limit(k)
      .select(row_number().over(Window.orderBy(xxhash64(col("vec_id")))).as("cid"),
        col("embedding").as("ce"), col("n2").as("cn"))
    for (_ <- 1 to iters) {
      val assigned = assignToCentroids(vecs, cents)
      cents = assigned
        .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("cid", "pos").agg(avg(col("x")).as("m"))
        .groupBy("cid")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m").cast("float")).as("ce"))
        .select(col("cid"), col("ce"), norm2(col("ce")).as("cn"))
        .localCheckpoint(eager = true) // k rows; cut the per-iter lineage
    }
    cents
  }

  /** (vec_id, embedding, n2, cid): nearest-centroid assignment (centroids
    * broadcast — the IVF partitioning step at any corpus size). */
  def assignToCentroids(vecs: DataFrame, cents: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("n2"), col("cid"),
        cosine(col("embedding"), col("n2"), col("ce"), col("cn")).as("ccos"))
      .withColumn("crk", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cid"))))
      .filter(col("crk") === 1)
      .select(col("vec_id"), col("embedding"), col("n2"), col("cid"))

  /** IVF top-k search over any centroid set (demo first-K or
    * kmeansCentroids). `nprobe` = number of nearest buckets each QUERY
    * searches (the standard IVF recall/cost knob; table vectors always live
    * in exactly one bucket). */
  def ivfSearch(vecs: DataFrame, cents: DataFrame, queryStride: Int,
                topK: Int, nprobe: Int = 1): DataFrame = {
    val assigned = assignToCentroids(vecs, cents)
    val q = vecs.filter(col("vec_id") % queryStride === 0)
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("n2"), col("cid"),
        cosine(col("embedding"), col("n2"), col("ce"), col("cn")).as("ccos"))
      .withColumn("crk", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cid"))))
      .filter(col("crk") <= nprobe)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("n2").as("qn"), col("cid"))
    val t = assigned.select(col("vec_id").as("vid"), col("embedding").as("te"),
      col("n2").as("tn"), col("cid"))
    q.join(t, Seq("cid")).filter(col("qid") =!= col("vid"))
      .select(col("qid"), col("vid"),
        cosine(col("qe"), col("qn"), col("te"), col("tn")).as("cos"))
      .dropDuplicates("qid", "vid") // a pair can meet in several probed buckets
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("vid"))))
      .filter(col("rk") <= topK)
      .select(col("qid"), col("vid"), col("rk").cast("long").as("rk"), col("cos"))
  }

  /** The exact-scan vectors relation (vec_id, embedding, n2) for dir. */
  def vectors(spark: SparkSession, dir: String): DataFrame = withNorm(spark, dir)

  /** Attach the cached squared norm to any (vec_id, embedding) relation —
    * the input shape every search / graph-build entry point expects. */
  def withN2(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("embedding"), norm2(col("embedding")).as("n2"))

  // ---- graph-flavor ANN (the reference's HNSW/Annoy backend slot,
  // fast_bert_similarity.py:24,48,139) ----
  // HNSW's greedy layered descent is inherently sequential per query; the
  // Spark-native re-expression is a DETERMINISTIC navigable-graph search
  // with bounded depth: a sparse entry layer (every `entryStride`-th vector
  // ~ the upper HNSW layer), per-query beam of the `ef` nearest entries,
  // then 2-hop expansion over a precomputed M-nearest-neighbor graph (~ the
  // base layer), exact-scoring only the expanded candidate set. All joins,
  // no iteration — oracle-checkable bit-exactly, and the ef knob trades
  // recall for cost exactly like HNSW's ef_search. At corpus scale the
  // kNN-graph build composes with the IVF layout — knnGraphBucketed below:
  // per-bucket local kNN stitched with nprobe >= 2 (EvalSpec grades it at
  // 100k vectors); knnGraph is the exact form, loudly capped to oracle scale.
  val NswCap = 2000L
  val NswM = 8
  val NswEntryStride = 64
  val NswEf = 4
  /** Exact-kNN-graph row cap: above this, the O(N²) self-join is a bug, not
    * a build — callers must hand nswSearch a knnGraphBucketed graph. */
  val NswExactGraphCap = 20000L

  /** Deterministic kNN neighbor graph: each node's M max-cosine neighbors
    * (cosine desc, id tie-break). EXACT O(N²) self-join — refuses inputs
    * above NswExactGraphCap so a caller pointing the public nswSearch API at
    * a 10^8-vector corpus fails loudly instead of scheduling N² work; the
    * scale path is knnGraphBucketed. */
  def knnGraph(vecs: DataFrame, m: Int): DataFrame = {
    val n = vecs.count()
    require(n <= NswExactGraphCap,
      s"knnGraph is the exact O(N^2) build, capped at $NswExactGraphCap rows " +
        s"(got $n); build the graph with knnGraphBucketed(vecs, m, centroids) " +
        "and pass it to nswSearch(..., graph = Some(g))")
    // The non-equi self-join is a broadcast nested loop whose parallelism is
    // the LEFT side's partition count — a small filtered parquet read is one
    // partition, which serializes the O(N²) cosine work onto one core
    // (measured: 22 s single-threaded vs sub-second spread). Hash-spread the
    // probe side first with an EXPLICIT count: the rows are only ~KBs, so
    // size-based AQE coalescing would fold a countless repartition straight
    // back to one partition, blind to the N-per-row join work behind it.
    // Results are unaffected (ranking is value-ordered).
    val l = vecs
      .repartition(vecs.sparkSession.sparkContext.defaultParallelism, col("vec_id"))
      .select(col("vec_id").as("src"), col("embedding").as("se"), col("n2").as("sn"))
    val r = vecs.select(col("vec_id").as("nbr"), col("embedding").as("ne"), col("n2").as("nn"))
    // top-m per source via the capped aggregator, not a window: a window
    // would shuffle the full O(N²) scored relation just to keep m rows per
    // source, where the aggregator's map-side partial combine ships at most
    // m candidates per (source, mapper). Same (c desc, nbr asc) total order
    // — the edge set is bit-identical (spec-pinned in EvalSpec).
    l.join(r, col("src") =!= col("nbr"))
      .select(col("src"), col("nbr"),
        cosine(col("se"), col("sn"), col("ne"), col("nn")).as("c"))
      .groupBy("src")
      .agg(graft.functions.TopNeighbors
        .topNeighbors(m)(col("nbr"), col("c")).as("g"))
      .select(col("src"), explode(col("g.ids")).as("nbr"))
  }

  /**
   * Distributed kNN-graph build — the per-IVF-bucket composition of the
   * exact form (HNSW's ef_construction analog re-expressed as equi-joins):
   * every vector lands in its nearest centroid's bucket; each SOURCE vector
   * additionally probes its `nprobe` nearest buckets so near-boundary nodes
   * see neighbors across the seam; neighbors rank per source within the
   * probed buckets only. Work is Σ_b |sources_b|·|bucket_b| ≈ N²·nprobe/K —
   * with K ~ √N centroids that is ~N^1.5 of shuffled equi-join work and no
   * stage ever materializes an O(N²) relation. The assignment window carries
   * only (vec_id, cid, ccos); embeddings join back after the top-nprobe cut,
   * keeping the widest shuffle at N·nprobe rows.
   */
  def knnGraphBucketed(vecs: DataFrame, m: Int, cents: DataFrame,
                       nprobe: Int = 2): DataFrame = {
    val assign = vecs.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        cosine(col("embedding"), col("n2"), col("ce"), col("cn")).as("ccos"))
      .withColumn("crk", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cid"))))
      .filter(col("crk") <= nprobe)
      .select("vec_id", "cid", "crk")
      // feeds both the source and member sides: assign once, not twice
      .localCheckpoint(eager = false)
    val srcs = assign.join(vecs, "vec_id")
      .select(col("vec_id").as("src"), col("embedding").as("se"),
        col("n2").as("sn"), col("cid"))
    val members = assign.filter(col("crk") === 1).join(vecs, "vec_id")
      .select(col("vec_id").as("nbr"), col("embedding").as("ne"),
        col("n2").as("nn"), col("cid"))
    // capped top-m aggregation instead of dropDuplicates + window: ONE
    // shuffle of <= m candidates per (source, mapper) replaces two full
    // shuffles of the ~N·nprobe·bucket joined relation. A pair meeting in
    // several probe buckets carries the same deterministic score, so the
    // aggregator's fold-by-id reproduces dropDuplicates exactly.
    srcs.join(members, Seq("cid"))
      .filter(col("src") =!= col("nbr"))
      .select(col("src"), col("nbr"),
        cosine(col("se"), col("sn"), col("ne"), col("nn")).as("c"))
      .groupBy("src")
      .agg(graft.functions.TopNeighbors
        .topNeighbors(m)(col("nbr"), col("c")).as("g"))
      .select(col("src"), explode(col("g.ids")).as("nbr"))
  }

  /** Navigable-graph top-k search (see block comment above). Pass a
    * knnGraphBucketed graph for corpora beyond NswExactGraphCap. */
  def nswSearch(vecs: DataFrame, queryStride: Int, m: Int, entryStride: Int,
                ef: Int, topK: Int, graph: Option[DataFrame] = None): DataFrame = {
    // the graph feeds BOTH hop joins and the beam feeds hop-1 AND the
    // candidate union — lazy-checkpoint each so the (expensive) build runs
    // once, not once per downstream reference
    val g = graph.getOrElse(knnGraph(vecs, m)).localCheckpoint(eager = false)
    val entries = vecs.filter(col("vec_id") % entryStride === 0)
      .select(col("vec_id").as("eid"), col("embedding").as("ee"), col("n2").as("en"))
    val q = vecs.filter(col("vec_id") % queryStride === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("n2").as("qn"))
    val qe = q.crossJoin(broadcast(entries))
      .select(col("qid"), col("eid"),
        cosine(col("qe"), col("qn"), col("ee"), col("en")).as("ec"))
      .withColumn("erk", row_number().over(
        Window.partitionBy("qid").orderBy(col("ec").desc, col("eid"))))
      .filter(col("erk") <= ef)
      .select("qid", "eid")
      .localCheckpoint(eager = false)
    val h1 = qe.join(g.withColumnRenamed("src", "eid"), "eid")
      .select(col("qid"), col("nbr"))
    val h2 = h1.withColumnRenamed("nbr", "mid")
      .join(g.withColumnRenamed("src", "mid"), "mid")
      .select(col("qid"), col("nbr"))
    val cand = qe.select(col("qid"), col("eid").as("vid"))
      .union(h1.select(col("qid"), col("nbr").as("vid")))
      .union(h2.select(col("qid"), col("nbr").as("vid")))
      .filter(col("qid") =!= col("vid"))
      .distinct()
    val t = vecs.select(col("vec_id").as("vid"), col("embedding").as("te"), col("n2").as("tn"))
    cand.join(q, "qid").join(t, "vid")
      .select(col("qid"), col("vid"),
        cosine(col("qe"), col("qn"), col("te"), col("tn")).as("cos"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("vid"))))
      .filter(col("rk") <= topK)
      .select(col("qid"), col("vid"), col("rk").cast("long").as("rk"), col("cos"))
  }

  // ---- tree-flavor ANN (the reference's Annoy backend slot,
  // fast_bert_similarity.py:24: AnnoyIndex n_trees=256 angular) ----
  // Annoy partitions by random hyperplanes between point pairs; the Spark
  // re-expression is sign-code bucketing: each of T trees carries D
  // deterministic hyperplanes (normal = difference of an embedding pair), a
  // vector's leaf code per tree is its D-bit sign pattern, and a query
  // searches exactly its own leaf in every tree — candidate generation is a
  // (tree, code) equi-join, the same shuffle shape as IVF, so the plan
  // scales to any corpus (leaf population ~ N/2^D per tree; more trees =
  // more recall, exactly Annoy's n_trees knob). Exact-scored, top-k.
  val AnnTrees = 2
  val AnnPlanesPerTree = 4
  val AnnPlaneBase = 32 // plane-pair vectors: vec_id in [32, 48)

  private def dotDiff(a: Column, p1: Column, p2: Column): Column =
    aggregate(zip_with(a, zip_with(p1, p2,
      (x, y) => x.cast("double") - y.cast("double")),
      (x, d) => x.cast("double") * d), lit(0.0), (acc, x) => acc + x)
  private def dotDiffSql(a: String, p1: String, p2: String): String =
    (1 to Dim).map(i =>
      s"CAST($a[$i] AS DOUBLE) * (CAST($p1[$i] AS DOUBLE) - CAST($p2[$i] AS DOUBLE))")
      .mkString("(", " + ", ")")

  /** Tree-ANN top-k over any (vec_id, embedding, n2) relation — the body of
    * `q_ann_tree`, factored so EvalSpec can grade recall vs n_trees at
    * corpus scale. Hyperplanes are drawn deterministically from the corpus
    * itself: plane i's normal is the difference of the embedding pair at
    * vec_ids (planeBase + 2i, planeBase + 2i + 1). Candidates = (tree, code)
    * equi-join; everything downstream is exact-scored. */
  def treeSearch(vecs: DataFrame, nTrees: Int, planesPerTree: Int,
                 planeBase: Long, queryStride: Int, topK: Int): DataFrame = {
    val nPl = nTrees * planesPerTree
    val e = vecs.select(col("vec_id"), col("embedding"))
    val p1 = e.filter(col("vec_id") >= planeBase &&
        col("vec_id") < planeBase + 2 * nPl &&
        pmod(col("vec_id") - planeBase, lit(2)) === 0)
      .select(((col("vec_id") - planeBase) / 2).cast("int").as("pid"),
        col("embedding").as("pe1"))
    val p2 = e.filter(col("vec_id") >= planeBase + 1 &&
        col("vec_id") < planeBase + 2 * nPl &&
        pmod(col("vec_id") - planeBase, lit(2)) === 1)
      .select(((col("vec_id") - planeBase - 1) / 2).cast("int").as("pid"),
        col("embedding").as("pe2"))
    val planes = p1.join(p2, "pid")
      .select(col("pid"), (col("pid") / planesPerTree).cast("int").as("tree"),
        pmod(col("pid"), lit(planesPerTree)).cast("int").as("plane"),
        col("pe1"), col("pe2"))
    val bits = vecs.crossJoin(broadcast(planes))
      .select(col("vec_id"), col("tree"),
        when(dotDiff(col("embedding"), col("pe1"), col("pe2")) >= 0,
          expr("shiftleft(1, plane)")).otherwise(lit(0)).as("bitv"))
    // codes feeds the query side AND the candidate side of the equi-join:
    // lazy-checkpoint so the crossJoin+aggregation over all vectors runs
    // once, not once per consumer
    val codes = bits.groupBy("vec_id", "tree").agg(sum("bitv").as("code"))
      .localCheckpoint(eager = false)
    val q = codes.filter(col("vec_id") % queryStride === 0)
      .select(col("vec_id").as("qid"), col("tree"), col("code"))
    val cand = q.join(codes.select(col("vec_id").as("vid"), col("tree"), col("code")),
        Seq("tree", "code"))
      .filter(col("qid") =!= col("vid"))
      .select("qid", "vid").distinct()
    val qv = vecs.filter(col("vec_id") % queryStride === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("n2").as("qn"))
    val t = vecs.select(col("vec_id").as("vid"), col("embedding").as("te"), col("n2").as("tn"))
    cand.join(qv, "qid").join(t, "vid")
      .select(col("qid"), col("vid"),
        cosine(col("qe"), col("qn"), col("te"), col("tn")).as("cos"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("vid"))))
      .filter(col("rk") <= topK)
      .select(col("qid"), col("vid"), col("rk").cast("long").as("rk"), col("cos"))
      .orderBy("qid", "rk")
  }

  val annTree = QueryDef(
    "q_ann_tree",
    (spark, dir) => treeSearch(withNorm(spark, dir), AnnTrees, AnnPlanesPerTree,
      AnnPlaneBase, QueryStride, TopK),
    Some {
      val hi = AnnPlaneBase + 2 * AnnTrees * AnnPlanesPerTree
      s"""WITH v AS (SELECT vec_id, embedding, ${norm2Sql("embedding")} AS n2 FROM embeddings),
        |p1 AS (SELECT CAST((vec_id - $AnnPlaneBase) // 2 AS INT) AS pid, embedding AS pe1
        |       FROM embeddings
        |       WHERE vec_id >= $AnnPlaneBase AND vec_id < $hi AND (vec_id - $AnnPlaneBase) % 2 = 0),
        |p2 AS (SELECT CAST((vec_id - ${AnnPlaneBase + 1}) // 2 AS INT) AS pid, embedding AS pe2
        |       FROM embeddings
        |       WHERE vec_id >= ${AnnPlaneBase + 1} AND vec_id < $hi AND (vec_id - $AnnPlaneBase) % 2 = 1),
        |pl AS (SELECT pid, pid // $AnnPlanesPerTree AS tree, pid % $AnnPlanesPerTree AS plane,
        |              pe1, pe2
        |       FROM p1 JOIN p2 USING (pid)),
        |bits AS (SELECT v.vec_id, tree,
        |                CASE WHEN ${dotDiffSql("v.embedding", "pe1", "pe2")} >= 0
        |                     THEN (1 << plane) ELSE 0 END AS bitv
        |         FROM v CROSS JOIN pl),
        |codes AS (SELECT vec_id, tree, sum(bitv) AS code FROM bits GROUP BY 1, 2),
        |q AS (SELECT vec_id AS qid, tree, code FROM codes WHERE vec_id % $QueryStride = 0),
        |cand AS (SELECT DISTINCT qid, c.vec_id AS vid
        |         FROM q JOIN codes c USING (tree, code) WHERE qid != c.vec_id),
        |scored AS (
        |  SELECT qid, vid, ${cosineSql("qv.embedding", "qv.n2", "tv.embedding", "tv.n2")} AS cos
        |  FROM cand JOIN v qv ON qid = qv.vec_id JOIN v tv ON vid = tv.vec_id
        |), ranked AS (
        |  SELECT qid, vid, cos,
        |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rk
        |  FROM scored
        |)
        |SELECT qid, vid, rk, cos FROM ranked WHERE rk <= $TopK ORDER BY qid, rk""".stripMargin
    })

  val annNsw = QueryDef(
    "q_ann_nsw",
    (spark, dir) =>
      nswSearch(withNorm(spark, dir).filter(col("vec_id") < NswCap),
        QueryStride, NswM, NswEntryStride, NswEf, TopK)
        .orderBy("qid", "rk"),
    Some {
      val cos = cosineSql _
      s"""WITH v AS (SELECT vec_id, embedding, ${norm2Sql("embedding")} AS n2
        |           FROM embeddings WHERE vec_id < $NswCap),
        |gpairs AS (
        |  SELECT l.vec_id AS src, r.vec_id AS nbr,
        |         row_number() OVER (PARTITION BY l.vec_id
        |           ORDER BY ${cos("l.embedding", "l.n2", "r.embedding", "r.n2")} DESC,
        |                    r.vec_id) AS nrk
        |  FROM v l JOIN v r ON l.vec_id != r.vec_id
        |),
        |g AS (SELECT src, nbr FROM gpairs WHERE nrk <= $NswM),
        |e AS (SELECT vec_id AS eid, embedding AS ee, n2 AS en FROM v
        |      WHERE vec_id % $NswEntryStride = 0),
        |q AS (SELECT vec_id AS qid, embedding AS qe, n2 AS qn FROM v
        |      WHERE vec_id % $QueryStride = 0),
        |qer AS (
        |  SELECT qid, eid,
        |         row_number() OVER (PARTITION BY qid
        |           ORDER BY ${cos("qe", "qn", "ee", "en")} DESC, eid) AS erk
        |  FROM q CROSS JOIN e
        |),
        |qe2 AS (SELECT qid, eid FROM qer WHERE erk <= $NswEf),
        |h1 AS (SELECT qid, nbr FROM qe2 JOIN g ON qe2.eid = g.src),
        |h2 AS (SELECT qid, g.nbr FROM h1 JOIN g ON h1.nbr = g.src),
        |cand AS (
        |  SELECT DISTINCT qid, vid FROM (
        |    SELECT qid, eid AS vid FROM qe2
        |    UNION ALL SELECT qid, nbr FROM h1
        |    UNION ALL SELECT qid, nbr FROM h2
        |  ) WHERE qid != vid
        |),
        |scored AS (
        |  SELECT qid, vid, ${cos("q.qe", "q.qn", "t.embedding", "t.n2")} AS cos
        |  FROM cand JOIN q USING (qid) JOIN v t ON cand.vid = t.vec_id
        |),
        |ranked AS (
        |  SELECT qid, vid, cos,
        |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rk
        |  FROM scored
        |)
        |SELECT qid, vid, rk, cos FROM ranked WHERE rk <= $TopK ORDER BY qid, rk""".stripMargin
    })

  val all: Seq[QueryDef] = Seq(embeddingNorms, cosineTopk, annIvf, annNsw, annTree)
}
