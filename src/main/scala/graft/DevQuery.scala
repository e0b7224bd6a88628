package graft

/** Dev-only: time named SparkEntry queries, interleaved reps, one session —
  * for isolating a single headline query's cost (e.g. the q_ann_nsw record)
  * without paying a full Bench run. A 4-thread CPU canary + DRAM canary run
  * before each rep so a sick host window is visible in the output.
  * Usage: runMain graft.DevQuery <sfDir> <cores> <reps> <q1,q2,...>
  */
object DevQuery {
  def main(args: Array[String]): Unit = {
    HwControls.warmHeap(0.6)
    HwControls.warmPages(
      sys.env.getOrElse("SPARK_GRAFT_WARM_GB", "24").toDouble, 32): Unit
    val sfDir = args(0)
    val cores = args(1).toInt
    val reps = args(2).toInt
    val names = args(3).split(",").toSeq
    val spark = SparkUtil.session(cores, "dev-query")
    spark.sparkContext.setLogLevel("WARN")
    val qmap = SparkEntry.queries
    (1 to reps).foreach { rep =>
      names.foreach { name =>
        val canary = HwControls.cpuOps(4, 1000) / 1e6
        val mem = HwControls.memGBps(4, 800)
        val t0 = System.nanoTime()
        val n = qmap(name)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[devquery] rep=$rep $name%-20s rows=$n%8d sec=$dt%8.3f canary=$canary%7.1f mem=$mem%5.1f")
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
      }
    }
    spark.stop()
  }
}
