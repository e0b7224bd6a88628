package graft

import graft.sources.LakeTable
import org.apache.spark.sql.functions._

/** Dev-only: isolate the full-commit (create) cost's dependence on bucket
  * count B — the per-FILE overhead that dominates toy-corpus initializes at
  * large B (rows/bucket ~ 5) and its projection to the sized design point
  * (~10^5+ rows/bucket). Times one LakeTable.commit of R rows at several B,
  * with the Hadoop FileOutputCommitter algorithm toggled 1/2 per rep: v1's
  * JOB commit renames all B files serially on the driver, v2 renames at task
  * commit (parallel) — the classic large-B create bottleneck.
  * Usage: runMain graft.DevFiles <rows> <reps> */
object DevFiles {
  def main(args: Array[String]): Unit = {
    HwControls.warmHeap(0.4)
    HwControls.warmPages(
      sys.env.getOrElse("SPARK_GRAFT_WARM_GB", "16").toDouble, 32): Unit
    val rows = if (args.length > 0) args(0).toLong else 100000L
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkUtil.session(32, "dev-files")
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.range(rows).select(
      concat(lit("clip_"), lpad(col("id").cast("string"), 10, "0")).as("clip_id"),
      sha2(col("id").cast("string"), 256).as("payload"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    df.count()
    def rmr(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmr))
      f.delete(): Unit
    }
    (1 to reps).foreach { rep =>
      Seq("1").foreach { algo =>
        spark.sparkContext.hadoopConfiguration
          .set("mapreduce.fileoutputcommitter.algorithm.version", algo)
        Seq(32, 1024, 4096).foreach { b =>
          val root = new java.io.File(SparkUtil.localDir, s"dev-files-$b")
          rmr(root)
          val t = new LakeTable(root.getAbsolutePath, "t", numBuckets = b)
          val can = HwControls.cpuOps(4, 800) / 1e6
          val t0 = System.nanoTime()
          t.commit(df, "create")
          val dt = (System.nanoTime() - t0) / 1e9
          println(f"[devfiles] rep=$rep algo=v$algo B=$b%-5d rows=$rows sec=$dt%7.2f canary=$can%7.1f")
          rmr(root)
        }
      }
    }
    spark.stop()
  }
}
