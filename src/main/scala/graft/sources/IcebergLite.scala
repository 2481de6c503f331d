package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.nio.file.StandardCopyOption.{ATOMIC_MOVE, REPLACE_EXISTING}
import scala.jdk.CollectionConverters._

/** Minimal Iceberg-style table layout (no Iceberg runtime is available in
  * this environment — SURVEY.md §7.4/§7.3 item 5): Parquet data files plus
  * append-only metadata side-tables with snapshot semantics at the logical
  * level:
  *
  *   <root>/data/<sub>/snapshot_id=<snap>/   parquet data, tied to a snapshot
  *   <root>/metadata/snapshots/     snapshot_id, ts_ms, operation, rows
  *   <root>/metadata/manifests/     snapshot_id, partition key, rows, status
  *   <root>/metadata/metrics/       per-partition job metrics (north rule)
  *   <root>/metadata/lineage/       output key → input snapshot/cell range
  *   <root>/SEQ                     persisted snapshot-id counter (atomic move)
  *   <root>/VERSION                 committed snapshot ids, one per line
  *
  * Commit = allocate a FRESH snapshot id from the persisted SEQ counter,
  * write data under data/<sub>/snapshot_id=<snap>/, append manifests +
  * snapshot row carrying that id, then atomically append the id to VERSION.
  * Readers ([[readData]], [[manifests]]) resolve VERSION first and select
  * only rows/files of committed snapshots, so a crashed writer's orphan
  * files and manifest rows stay invisible forever (snapshot isolation for
  * append-only workloads): a torn commit's id is consumed by SEQ and never
  * appears in VERSION, and the retry runs under a new id, so no replay can
  * resurrect orphans. The manifest table doubles as the resume mechanism:
  * work already present for a committed snapshot is anti-joined away
  * (satproc's skip-existing, F6, reference: satproc/chips.py:227-233).
  */
class IcebergLite(root: String, spark: SparkSession) {
  private val metaDir = s"$root/metadata"
  private def versionFile = Paths.get(root, "VERSION")
  private def seqFile = Paths.get(root, "SEQ")

  /** NIO directory streams hold an open fd until closed — every
    * Files.list/Files.walk here runs under this loan so maintenance calls
    * can't leak descriptors. */
  private def withStream[A, B](s: java.util.stream.Stream[A])(f: java.util.stream.Stream[A] => B): B =
    try f(s) finally s.close()

  /** Committed snapshot ids in commit order (VERSION file, one per line). */
  def committedSnapshots(): Seq[Long] =
    if (Files.exists(versionFile))
      new String(Files.readAllBytes(versionFile)).split('\n')
        .iterator.map(_.trim).filter(_.nonEmpty).map(_.toLong).toSeq
    else Seq.empty

  def currentSnapshot(): Long = committedSnapshots().lastOption.getOrElse(0L)

  /** Committed ids visible AS OF snapshot `snap`: the VERSION prefix ending
    * at `snap` (VERSION is append-only in commit order, so the prefix IS the
    * table state right after that commit published). Travelling to an id not
    * in VERSION — never allocated, torn (allocated but never published), or
    * expired by [[compact]] — is an error rather than an empty read, matching
    * Iceberg's snapshot-expiry semantics: the caller must know its pin is
    * gone, not silently retrain on zero rows. */
  def committedSnapshotsAsOf(snap: Long): Seq[Long] = {
    val committed = committedSnapshots()
    val idx = committed.indexOf(snap)
    require(idx >= 0,
      s"snapshot $snap is not visible: never committed, torn, or expired by compaction " +
        s"(committed: ${committed.mkString("[", ",", "]")})")
    committed.take(idx + 1)
  }

  /** Allocate a fresh snapshot id from the persisted counter. Ids consumed
    * by torn commits are never reused, so a retry can never write under an
    * orphan's id and accidentally legitimize its files. */
  private def allocateSnapshotId(): Long = {
    Files.createDirectories(Paths.get(root))
    val prev =
      if (Files.exists(seqFile)) new String(Files.readAllBytes(seqFile)).trim.toLong
      else 0L
    val next = prev + 1
    val tmp = Paths.get(root, s".SEQ.$next.tmp")
    Files.write(tmp, next.toString.getBytes, StandardOpenOption.CREATE,
      StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, seqFile, ATOMIC_MOVE, REPLACE_EXISTING)
    next
  }

  /** Append a data batch as a new snapshot. `manifest` must contain one row
    * per logical work unit (e.g. tile) with a `part_key` column.
    * `abortBeforeVersionMove` is a crash-injection hook for tests: it
    * simulates a writer dying after all file writes but before the atomic
    * VERSION publish (the torn-commit window). */
  def commit(data: Option[(DataFrame, String)], manifest: DataFrame,
             operation: String, abortBeforeVersionMove: Boolean = false): Long = {
    val snap = allocateSnapshotId()
    data.foreach { case (df, sub) =>
      df.write.mode(SaveMode.Append).parquet(s"$root/data/$sub/snapshot_id=$snap")
    }
    manifest.withColumn("snapshot_id", lit(snap))
      .write.mode(SaveMode.Append).parquet(s"$metaDir/manifests")
    val rows = manifest.count()
    import spark.implicits._
    Seq((snap, System.currentTimeMillis(), operation, rows))
      .toDF("snapshot_id", "ts_ms", "operation", "rows")
      .write.mode(SaveMode.Append).parquet(s"$metaDir/snapshots")
    if (abortBeforeVersionMove) return snap // simulated crash: id burned, nothing published
    val tmp = Paths.get(root, s".VERSION.$snap.tmp")
    Files.write(tmp, (committedSnapshots() :+ snap).mkString("\n").getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, versionFile, ATOMIC_MOVE, REPLACE_EXISTING)
    snap
  }

  /** Above this many committed snapshots, filter with a semi-join against a
    * committed-ids dataset instead of an `isin` literal list: the literal
    * list grows the PLAN itself linearly per commit (quadratic analysis
    * cost over a long-lived append-only table), while the semi-join stays
    * O(1) in plan size and Spark's dynamic partition pruning still prunes
    * snapshot_id directories at runtime. Below it, the static `isin` is
    * kept for compile-time partition pruning (orphan dirs never opened). */
  private val IsinPruneLimit = 64

  private def committedOnly(df: DataFrame, committed: Seq[Long]): DataFrame =
    if (committed.length <= IsinPruneLimit)
      df.where(col("snapshot_id").isin(committed: _*))
    else {
      import spark.implicits._
      df.join(broadcast(committed.toDF("snapshot_id")), Seq("snapshot_id"), "left_semi")
    }

  /** Snapshot-isolated data reader: only files under committed snapshot
    * directories are visible. Returns empty when the table has committed
    * snapshots but nothing was ever written under data/<sub> (metadata-only
    * commits, or a first data commit to a different sub). */
  def readData(sub: String): DataFrame =
    readDataVisible(sub, committedSnapshots())

  /** Time-travel data reader: the table exactly as it stood when `snap`
    * published — "reproduce yesterday's training set" is
    * `readDataAsOf(sub, pinnedSnapshotId)`. Same partition-pruned plan shape
    * as [[readData]]; only the visible-id set differs, so the cost of an
    * as-of read is the cost of reading that snapshot's prefix, never a log
    * replay. */
  def readDataAsOf(sub: String, snap: Long): DataFrame =
    readDataVisible(sub, committedSnapshotsAsOf(snap))

  private def readDataVisible(sub: String, visible: Seq[Long]): DataFrame =
    if (visible.isEmpty || !Files.exists(Paths.get(root, "data", sub)))
      spark.emptyDataFrame
    else committedOnly(spark.read.parquet(s"$root/data/$sub"), visible)
      .drop("snapshot_id")

  /** Committed manifest rows visible at the current snapshot. */
  def manifests(): DataFrame =
    manifestsVisible(committedSnapshots())

  /** Manifest rows as of snapshot `snap` (the resume/skip-existing state a
    * worker would have observed right after that commit). */
  def manifestsAsOf(snap: Long): DataFrame =
    manifestsVisible(committedSnapshotsAsOf(snap))

  private def manifestsVisible(visible: Seq[Long]): DataFrame =
    if (visible.isEmpty) spark.emptyDataFrame
    else committedOnly(spark.read.parquet(s"$metaDir/manifests"), visible)

  /** Resume filter: drop work units whose part_key is already committed
    * (anti-join against the manifest — satproc skip-existing semantics). */
  def pendingWork(work: DataFrame, keyCol: String): DataFrame =
    if (committedSnapshots().isEmpty) work
    else work.join(manifests().select(col("part_key").as(keyCol)).distinct(),
      Seq(keyCol), "left_anti")

  /** The pending-work set as a worker would have computed it right after
    * snapshot `snap` published — replays a historical resume decision for
    * audit/lineage ("which tiles were still open when job J started?"). */
  def pendingWorkAsOf(work: DataFrame, keyCol: String, snap: Long): DataFrame =
    work.join(manifestsAsOf(snap).select(col("part_key").as(keyCol)).distinct(),
      Seq(keyCol), "left_anti")

  /** Maintenance: snapshot expiry + manifest compaction (single-writer op,
    * like Iceberg's own maintenance actions). A long-lived append-only
    * table otherwise accumulates one data directory, one manifest file and
    * one VERSION line per commit — after N commits every read plans over N
    * snapshot ids and N parquet fragments. Compaction rewrites all
    * committed data (per `sub`) and all committed manifest rows under ONE
    * fresh snapshot id, publishes VERSION = [that id] atomically, then
    * physically drops the superseded data directories and manifest files —
    * so read planning returns to O(1) while [[readData]]/[[manifests]]/
    * [[pendingWork]] results are bit-identical (ResumeSpec pins a
    * 200-commit table reading identically after compaction).
    *
    * Crash safety mirrors [[commit]]: everything is written under the new
    * id BEFORE the atomic VERSION move (a crash leaves the new files
    * invisible and the old table intact); physical deletion runs only
    * AFTER the move, and a crash mid-cleanup leaves only invisible
    * leftovers that the next compaction removes. */
  def compact(): Long = {
    import spark.implicits._
    val old = committedSnapshots()
    require(old.nonEmpty, "nothing to compact: no committed snapshots")
    val snap = allocateSnapshotId()
    // every data sub-table is rewritten (discovered from the layout, so a
    // caller cannot accidentally expire a sub it forgot to list)
    val dataRootDir = Paths.get(root, "data")
    val subs: Seq[String] =
      if (Files.exists(dataRootDir))
        withStream(Files.list(dataRootDir))(_.iterator().asScala
          .filter(Files.isDirectory(_)).map(_.getFileName.toString).toList)
      else Seq.empty
    subs.foreach { sub =>
      val df = readData(sub)
      if (df.schema.nonEmpty)
        df.write.mode(SaveMode.Append).parquet(s"$root/data/$sub/snapshot_id=$snap")
    }
    val mf = manifests()
    val mfRows =
      if (mf.schema.nonEmpty) {
        val compacted = mf.drop("snapshot_id").withColumn("snapshot_id", lit(snap))
        // ORDERING CONTRACT: count BEFORE the append below — the count's scan
        // lists the manifest directory at action time, so counting after the
        // append would scan the freshly written file too and depend on the
        // committed-ids filter (built before `snap` existed) to exclude it.
        // The write itself is safe: its read-side file index is resolved at
        // job planning, before any output file commits.
        val n = compacted.count()
        compacted.coalesce(1).write.mode(SaveMode.Append).parquet(s"$metaDir/manifests")
        n
      } else 0L
    Seq((snap, System.currentTimeMillis(), "compact", mfRows))
      .toDF("snapshot_id", "ts_ms", "operation", "rows")
      .write.mode(SaveMode.Append).parquet(s"$metaDir/snapshots")
    // commit point: only the compaction snapshot survives
    val tmp = Paths.get(root, s".VERSION.$snap.tmp")
    Files.write(tmp, snap.toString.getBytes, StandardOpenOption.CREATE,
      StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, versionFile, ATOMIC_MOVE, REPLACE_EXISTING)
    // physical expiry: superseded data dirs, then manifest files whose rows
    // all carry superseded ids (each file is deleted only after a cheap
    // per-file id scan, so the directory stays readable at every instant)
    val dataRoot = Paths.get(root, "data")
    if (Files.exists(dataRoot)) {
      val superseded = withStream(Files.walk(dataRoot, 2))(_.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("snapshot_id=") &&
          p.getFileName.toString != s"snapshot_id=$snap").toList)
      superseded.foreach { dir =>
        withStream(Files.walk(dir))(_.sorted(
            java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(Files.delete(_)))
      }
    }
    // manifest expiry in ONE distributed pass: read the directory once with
    // input_file_name() to find files carrying LIVE rows, then delete every
    // listed parquet NOT in that set — the old per-file driver loop planned
    // O(files) separate read jobs, quadratic driver work over a long-lived
    // table's lifetime. Dead = listed − live (not "grouped and not live"):
    // a ZERO-row manifest file produces no input_file_name group at all and
    // would otherwise leak forever; and if the directory holds no readable
    // parquet there is nothing to read and nothing to delete.
    val mfDir = Paths.get(metaDir, "manifests")
    if (Files.exists(mfDir)) {
      val allFiles = withStream(Files.list(mfDir))(_.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toList)
      if (allFiles.nonEmpty) {
        val live = spark.read.parquet(mfDir.toString)
          .where(col("snapshot_id") === snap)
          .select(input_file_name().as("f"))
          .distinct().as[String].collect()
          .map(f => Paths.get(new java.net.URI(f)).toRealPath()).toSet
        allFiles.filterNot(p => live.contains(p.toRealPath()))
          .foreach(Files.deleteIfExists(_))
      }
    }
    snap
  }

  /** Append per-partition metrics rows (job_id, stage, partition, rows_in,
    * rows_out, wall_ms, checksum) — the north rule's lineage/metrics tables. */
  def appendMetrics(metrics: DataFrame): Unit =
    metrics.write.mode(SaveMode.Append).parquet(s"$metaDir/metrics")

  def appendLineage(lineage: DataFrame): Unit =
    lineage.write.mode(SaveMode.Append).parquet(s"$metaDir/lineage")

  def metrics(): DataFrame = spark.read.parquet(s"$metaDir/metrics")
}
