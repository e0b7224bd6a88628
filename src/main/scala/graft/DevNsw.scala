package graft

import graft.queries.EmbeddingQueries
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only: A/B the exact kNN-graph build's two top-m forms (window ranking
  * over the full scored relation vs capped TopNeighbors aggregation),
  * interleaved in one session, plus the full q_ann_nsw on each.
  * Usage: runMain graft.DevNsw <sfDir> <reps> */
object DevNsw {
  def main(args: Array[String]): Unit = {
    HwControls.warmHeap(0.6)
    HwControls.warmPages(
      sys.env.getOrElse("SPARK_GRAFT_WARM_GB", "24").toDouble, 32): Unit
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkUtil.session(32, "dev-nsw")
    spark.sparkContext.setLogLevel("WARN")
    import EmbeddingQueries._
    val vecs = vectors(spark, sfDir).filter(col("vec_id") < NswCap)

    def aggForm(): Long = knnGraph(vecs, NswM).count()
    def winForm(): Long = {
      val l = vecs.repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
        .select(col("vec_id").as("src"), col("embedding").as("se"), col("n2").as("sn"))
      val r = vecs.select(col("vec_id").as("nbr"), col("embedding").as("ne"), col("n2").as("nn"))
      l.join(r, col("src") =!= col("nbr"))
        .select(col("src"), col("nbr"),
          (aggregate(zip_with(col("se"), col("ne"),
            (x, y) => x.cast("double") * y.cast("double")),
            lit(0.0), (acc, x) => acc + x)
            / (sqrt(col("sn")) * sqrt(col("nn")))).as("c"))
        .withColumn("nrk", row_number().over(
          Window.partitionBy("src").orderBy(col("c").desc, col("nbr"))))
        .filter(col("nrk") <= NswM)
        .select("src", "nbr").count()
    }
    def full(): Long =
      SparkEntry.queries("q_ann_nsw")(spark, sfDir).count()

    def time(tag: String, f: () => Long): Unit = {
      val can = HwControls.cpuOps(4, 800) / 1e6
      val t0 = System.nanoTime()
      val n = f()
      println(f"[devnsw] $tag%-8s rows=$n%8d sec=${(System.nanoTime() - t0) / 1e9}%7.3f canary=$can%7.1f")
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    (1 to reps).foreach { _ =>
      time("agg", aggForm); time("window", winForm); time("full", full)
    }
    spark.stop()
  }
}
