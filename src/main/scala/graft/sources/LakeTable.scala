package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/**
 * Iceberg-shaped table layer over partitioned parquet: versioned snapshots
 * with an atomically-committed manifest, giving MERGE-INTO semantics as
 * read-join-overwrite-commit plus time-travel to any retained snapshot.
 *
 * The sandbox ships no Iceberg/Delta runtime (SURVEY.md §7.0), so this shim
 * carries the table contract the engine needs — snapshot isolation, commit
 * metadata (lineage + metrics rows per the north rule), resume-from-last-
 * committed-snapshot — with an API shaped so a real Iceberg catalog drops in
 * via config in production (every call site goes through read/commit).
 *
 * Layout:
 *   <root>/<name>/data/v<NNN>/part-*.parquet   — immutable snapshot data
 *   <root>/<name>/_snapshots/v<NNN>.json       — commit metadata
 *   <root>/<name>/_snapshots/LATEST            — pointer, atomic rename
 *
 * Replaces the reference's pickled detector state + positional FAISS files
 * (improved_faiss_detector.py:508-609): state lives in queryable tables, a
 * restart reads LATEST, and a failed job never publishes a half-written
 * snapshot (data is written fully before the pointer moves).
 */
final class LakeTable(val root: String, val name: String) {
  private def dir: Path = Paths.get(root, name)
  private def snapDir: Path = dir.resolve("_snapshots")
  private def latestFile: Path = snapDir.resolve("LATEST")

  def exists: Boolean = Files.exists(latestFile)

  def currentVersion: Int =
    if (!exists) -1 else new String(Files.readAllBytes(latestFile)).trim.toInt

  private def dataPath(v: Int): Path = dir.resolve(s"data/v$v")

  /** Read the latest committed snapshot (or a specific version). */
  def read(spark: SparkSession, version: Int = -1): DataFrame = {
    val v = if (version >= 0) version else currentVersion
    require(v >= 0, s"table $name has no committed snapshot")
    spark.read.parquet(dataPath(v).toString)
  }

  /** Write df as the next snapshot and atomically publish it.
    * @param operation  commit kind recorded in the manifest (create /
    *                   overwrite / merge / append-rewrite)
    * @param metrics    lineage counters recorded with the commit */
  def commit(df: DataFrame, operation: String,
             metrics: Map[String, Long] = Map.empty): Int = {
    val v = currentVersion + 1
    val out = dataPath(v)
    df.write.mode("overwrite").parquet(out.toString)
    Files.createDirectories(snapDir)
    val metricsJson = metrics.map { case (k, mv) => s""""$k": $mv""" }
      .mkString("{", ", ", "}")
    val manifest =
      s"""{"version": $v, "operation": "$operation", "parent": ${v - 1},
         | "data": "${out.toString}", "metrics": $metricsJson}""".stripMargin
    Files.write(snapDir.resolve(s"v$v.json"),
      manifest.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // atomic publish: readers see the old snapshot until the rename lands
    val tmp = snapDir.resolve(s".LATEST.tmp$v")
    Files.write(tmp, v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Files.move(tmp, latestFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    v
  }

  /** All commit manifests, oldest first (the table's lineage log). */
  def history: Seq[String] =
    if (!Files.exists(snapDir)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      Files.list(snapDir).iterator().asScala
        .filter(_.getFileName.toString.matches("v\\d+\\.json"))
        .toSeq.sortBy(p => p.getFileName.toString.stripPrefix("v").stripSuffix(".json").toInt)
        .map(p => new String(Files.readAllBytes(p)))
    }
}

object LakeTable {
  def apply(root: String, name: String): LakeTable = new LakeTable(root, name)
}
