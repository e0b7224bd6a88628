package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Connected components over a dup-pair edge list via iterative min-label
 * propagation — the exact-resolution replacement for the reference's greedy
 * overlapping community detection (similarities/utils/util.py:237-305):
 * each node deterministically joins the component of its minimum reachable
 * id, so cluster assignment is total and non-overlapping (the property the
 * reference approximates with its size-desc greedy overlap removal,
 * utils/util.py:288-303).
 *
 * Algorithm: alternate label spreading (each node takes the min of its own
 * and neighbor labels) until fixpoint, with a path-halving style shortcut —
 * labels are themselves node ids, so after spreading we re-point every label
 * at ITS label (label(label(v))), which collapses chains in O(log n) rounds
 * instead of O(diameter).
 *
 * Each round is a shuffle on node id; `localCheckpoint` cuts lineage so the
 * plan does not grow with iterations (CC at 10^12 scale dies on lineage
 * before it dies on data).
 */
object ConnectedComponents {

  /** Edge count at or below which the single-task union-find fast path runs
    * (see `runLocal`). ~24 bytes/edge of hash-map state: 2M edges ≈ 100 MB in
    * one task — far below executor memory, far above any bench/test graph. */
  val LocalEdgeThreshold = 2000000L

  /**
   * @param edges DataFrame with long/string columns (a, b)
   * @param nEdgesHint known edge count (e.g. from the pipeline's pair-cap
   *   action), or -1. When the graph is SMALL (<= LocalEdgeThreshold) and
   *   string-keyed, dispatches to a one-task union-find instead of paying
   *   O(log n) driver-synchronized join rounds — the same adaptive move AQE
   *   makes for broadcast joins (dup graphs are tiny relative to their
   *   corpus; the iterative path remains the 10^12-scale route and is what
   *   the hint > threshold case uses).
   * @return (node, component) where component = min node id reachable
   */
  def run(edges: DataFrame, maxIter: Int = 50, nEdgesHint: Long = -1L): DataFrame = {
    if (nEdgesHint >= 0 && nEdgesHint <= LocalEdgeThreshold &&
        edges.schema("a").dataType == org.apache.spark.sql.types.StringType &&
        edges.schema("b").dataType == org.apache.spark.sql.types.StringType)
      return runLocal(edges)
    val sym = edges.select(col("a").as("src"), col("b").as("dst"))
      .union(edges.select(col("b").as("src"), col("a").as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Labels are monotonically non-increasing, so the label assignment is at
    // a fixpoint iff an order-insensitive signature of (node, label) pairs is
    // unchanged. The signature aggregation doubles as the action that
    // materializes each round's persisted labels: ONE driver round-trip per
    // round (serial driver time is what Amdahl charges against scaling
    // efficiency at high core counts).
    def signature(df: DataFrame): Long = {
      val r = df.agg(expr("bit_xor(xxhash64(concat_ws('|', node, label)))")).first()
      if (r.isNullAt(0)) 0L else r.getLong(0) // null = empty edge set
    }
    // LAZY localCheckpoint: the signature aggregation is the action that
    // materializes it, so each round costs ONE driver action AND the logical
    // plan is truncated — labels appear twice per round (spread + halving),
    // so without checkpointing the plan doubles every iteration and the
    // optimizer spins for minutes after ~10 rounds.
    def pin(df: DataFrame): DataFrame = df.localCheckpoint(eager = false)

    // seed labels with min(node, min neighbor): one aggregation that skips
    // what would otherwise be the first propagation round
    var labels = pin(sym.groupBy(col("src").as("node"))
      .agg(least(col("node"), min(col("dst"))).as("label")))
    var prevSig = signature(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // spread: neighbor-label minimum
      val nbr = sym.join(labels.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), col("label"))
      val spread = labels.select("node", "label").union(nbr)
        .groupBy("node").agg(min("label").as("label"))
      // shortcut: label := label(label)  (path halving)
      val asLabel = spread.select(col("node").as("lnode"), col("label").as("llabel"))
      val halved = pin(spread.join(asLabel, spread("label") === asLabel("lnode"), "left")
        .select(col("node"), coalesce(col("llabel"), col("label")).as("label")))
      val sig = signature(halved)
      converged = sig == prevSig
      prevSig = sig
      labels = halved
      iter += 1
    }
    sym.unpersist()
    labels.select(col("node"), col("label").as("component"))
  }

  /** Single-task union-find over a gathered edge partition — executor-side
    * (never collect()ed to the driver), min-id representative with path
    * compression, identical output to the iterative path (MinHashSpec-style
    * equality pinned in OperatorSpec). */
  private def runLocal(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    edges.select(col("a").cast("string"), col("b").cast("string"))
      .as[(String, String)]
      .repartition(1)
      .mapPartitions { it =>
        val parent = scala.collection.mutable.HashMap.empty[String, String]
        def find(x: String): String = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x
          while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        val nodes = scala.collection.mutable.HashSet.empty[String]
        it.foreach { case (a, b) =>
          nodes += a; nodes += b
          val ra = find(a); val rb = find(b)
          if (ra != rb) {
            if (ra < rb) parent(rb) = ra else parent(ra) = rb
          }
        }
        nodes.iterator.map(n => (n, find(n)))
      }
      .toDF("node", "component")
  }

  /** Clusters with at least minSize members; component id = min member id.
    * Sizes via groupBy + join, NOT a window over component: a partitioned
    * window lands an entire mega-component (boilerplate-driven giant
    * clusters) on one task and AQE does not split skewed window partitions;
    * the aggregation partial-combines map-side and the equi-join AQE-splits. */
  def clusters(edges: DataFrame, minSize: Int, nEdgesHint: Long = -1L): DataFrame = {
    // checkpoint the assignment: it is consumed TWICE (sizes + join), and
    // uncached each reference re-runs the whole components computation —
    // measured as a ~2x serial term on the pipeline's critical path (CC wall
    // was identical at 1 and 4 cores before this cut). LAZY: both consumers
    // live in the single plan returned here, so the caller's one action
    // materializes the assignment once (same RDD object under both branches;
    // the sizes side builds first as the join's broadcast, caching the
    // blocks the probe side then scans) — an eager cut here would cost an
    // extra blocking driver action per clusters() call.
    val (assign, _) = graft.SparkUtil.checkpointCut(
      run(edges, nEdgesHint = nEdgesHint), eager = false)
    val sizes = assign.groupBy("component").agg(count(lit(1)).as("clusterSize"))
      .filter(col("clusterSize") >= minSize)
    assign.join(sizes, "component")
      .select(col("node"), col("component"), col("clusterSize"))
  }
}
