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
  def localDir: String = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) {
      val d = new java.io.File(shm, "spark-graft-local")
      d.mkdirs()
      d.getAbsolutePath
    } else System.getProperty("java.io.tmpdir")
  }

  def session(cores: Int, appName: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      // 2x cores: AQE coalesces surplus partitions, while exactly-cores
      // partitioning makes every skewed task a straggler with idle cores
      .config("spark.sql.shuffle.partitions", 2 * cores)
      // AQE stays ON by default (skew-join/coalesce are part of the scale
      // design). Each AQE query stage is a blocking driver round-trip
      // (~170 ms measured), which is noise when stages run minutes on a
      // cluster but dominates a small local probe (~74 stages/run) — the
      // env knob lets the bench measure that serial floor honestly.
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", localDir)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
