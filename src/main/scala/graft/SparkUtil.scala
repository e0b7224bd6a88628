package graft

import org.apache.spark.sql.SparkSession

/** Shared local SparkSession factory for mains (Bench/Verify/Profile).
  *
  * spark.local.dir points at tmpfs (/dev/shm) when available: local-mode
  * shuffle and spill files otherwise serialize on a single disk, which
  * flat-lines multi-core scaling (observed: executor threads parked in
  * FileDispatcherImpl.write0 while CPUs idle). On a real cluster the
  * equivalent is NVMe/ramdisk scratch per executor.
  */
object SparkUtil {

  /** Eager localCheckpoint + a handle to free its blocks.
    *
    * Why not .persist(): a cached-but-unCUT DataFrame keeps its full logical
    * tree, and every downstream reference re-embeds it. Plan RENDERING
    * (posted with each SQLExecutionStart/AQE event) and parts of
    * optimization walk that tree per reference — with the pipeline's layered
    * verify joins the walk is exponential in layer depth (measured: 80M-char
    * renders, multi-second driver walks per event, on a 120-row corpus).
    * Checkpointing replaces the tree with a LogicalRDD leaf.
    *
    * Why not plain .localCheckpoint(): its RDD blocks are invisible to the
    * cache manager and leak across jobs (measured ~2x eviction-churn CPU on
    * later jobs); the returned thunk reaches into the LogicalRDD and frees
    * them, restoring persist/unpersist discipline. */
  def checkpointCut(df: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, () => Unit) = {
    val cp = df.localCheckpoint(eager = true)
    val rdd = cp.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }
    (cp, () => rdd.foreach(_.unpersist(blocking = false)))
  }

  def localDir: String = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) {
      val d = new java.io.File(shm, "spark-graft-local")
      d.mkdirs()
      d.getAbsolutePath
    } else System.getProperty("java.io.tmpdir")
  }

  def session(cores: Int, appName: String, aqe: Option[Boolean] = None,
              shufflePartitions: Option[Int] = None): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      // 2x cores: AQE coalesces surplus partitions, while exactly-cores
      // partitioning makes every skewed task a straggler with idle cores.
      // The scaling probe overrides this to the SAME count at both levels:
      // different partition counts mean different per-task combine/spill
      // behavior — a different JOB, not the same job at two parallelisms.
      .config("spark.sql.shuffle.partitions",
        shufflePartitions.getOrElse(2 * cores))
      // AQE stays ON by default (skew-join/coalesce are part of the scale
      // design). Each AQE query stage is a blocking driver round-trip
      // (~170 ms measured), which is noise when stages run minutes on a
      // cluster but dominates a small local probe (~74 stages/run) — the
      // env knob (or the explicit `aqe` override, used by the scaling
      // probe's legs) lets the bench measure that serial floor honestly.
      .config("spark.sql.adaptive.enabled", aqe.map(_.toString)
        .getOrElse(sys.env.getOrElse("SPARK_GRAFT_AQE", "true")))
      // AQE re-renders the FULL plan explain string on every query-stage
      // update (AdaptiveSparkPlanExec.onUpdatePlan -> explainString) just to
      // post a listener event; with deep plans (bucket-pruned multi-table
      // merges) that is seconds of driver CPU per update and was measured
      // (jstack) as ~75% of a 20-row incremental merge's wall time. Truncate
      // the rendering — events/UI only, zero effect on execution.
      .config("spark.sql.maxPlanStringLength", "8192")
      // ...and render those event strings in "simple" mode: the default
      // "formatted" mode walks the whole tree for codegen ids with a
      // regex-compiling nodeName per node (jstack: Pattern.compile under
      // TreeNode.nodeName), which truncation alone does not skip.
      .config("spark.sql.ui.explainMode", "simple")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", localDir)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
