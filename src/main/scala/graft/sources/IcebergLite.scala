package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Minimal Iceberg-style table layout (no Iceberg runtime is available in
  * this environment — SURVEY.md §7.4/§7.3 item 5): Parquet data files plus
  * append-only metadata side-tables with snapshot semantics at the logical
  * level:
  *
  *   <root>/data/...                parquet data (partitioned)
  *   <root>/metadata/snapshots/     snapshot_id, ts_ms, operation, rows
  *   <root>/metadata/manifests/     snapshot_id, partition key, rows, status
  *   <root>/metadata/metrics/       per-partition job metrics (north rule)
  *   <root>/metadata/lineage/       output key → input snapshot/cell range
  *   <root>/VERSION                 last committed snapshot id (atomic move)
  *
  * Commit = write data, append manifests+snapshot row, then atomically
  * replace VERSION. Readers resolve VERSION first, so a crashed writer is
  * invisible (snapshot isolation for append-only workloads). The manifest
  * table doubles as the resume mechanism: work already present for the
  * current snapshot is anti-joined away (satproc's skip-existing, F6,
  * reference: satproc/chips.py:227-233).
  */
class IcebergLite(root: String, spark: SparkSession) {
  private val metaDir = s"$root/metadata"
  private def versionFile = Paths.get(root, "VERSION")

  def currentSnapshot(): Long =
    if (Files.exists(versionFile)) new String(Files.readAllBytes(versionFile)).trim.toLong
    else 0L

  /** Append a data batch as a new snapshot. `manifest` must contain one row
    * per logical work unit (e.g. tile) with a `part_key` column. */
  def commit(data: Option[(DataFrame, String)], manifest: DataFrame,
             operation: String): Long = {
    val snap = currentSnapshot() + 1
    data.foreach { case (df, sub) =>
      df.write.mode(SaveMode.Append).parquet(s"$root/data/$sub")
    }
    manifest.withColumn("snapshot_id", lit(snap))
      .write.mode(SaveMode.Append).parquet(s"$metaDir/manifests")
    val rows = manifest.count()
    import spark.implicits._
    Seq((snap, System.currentTimeMillis(), operation, rows))
      .toDF("snapshot_id", "ts_ms", "operation", "rows")
      .write.mode(SaveMode.Append).parquet(s"$metaDir/snapshots")
    Files.createDirectories(Paths.get(root))
    val tmp = Paths.get(root, s".VERSION.$snap.tmp")
    Files.write(tmp, snap.toString.getBytes, StandardOpenOption.CREATE,
      StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, versionFile, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    snap
  }

  /** Committed manifest rows visible at the current snapshot. */
  def manifests(): DataFrame = {
    val snap = currentSnapshot()
    if (snap == 0) spark.emptyDataFrame
    else spark.read.parquet(s"$metaDir/manifests").where(col("snapshot_id") <= snap)
  }

  /** Resume filter: drop work units whose part_key is already committed
    * (anti-join against the manifest — satproc skip-existing semantics). */
  def pendingWork(work: DataFrame, keyCol: String): DataFrame = {
    val snap = currentSnapshot()
    if (snap == 0) work
    else work.join(manifests().select(col("part_key").as(keyCol)).distinct(),
      Seq(keyCol), "left_anti")
  }

  /** Append per-partition metrics rows (job_id, stage, partition, rows_in,
    * rows_out, wall_ms, checksum) — the north rule's lineage/metrics tables. */
  def appendMetrics(metrics: DataFrame): Unit =
    metrics.write.mode(SaveMode.Append).parquet(s"$metaDir/metrics")

  def appendLineage(lineage: DataFrame): Unit =
    lineage.write.mode(SaveMode.Append).parquet(s"$metaDir/lineage")

  def metrics(): DataFrame = spark.read.parquet(s"$metaDir/metrics")
}
