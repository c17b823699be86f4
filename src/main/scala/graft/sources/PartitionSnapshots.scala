package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-partition snapshot manifests — the documented follow-up to
  * [[Snapshots]] for PARTITIONED facts, closing the one commit window the
  * flat hive layout leaves open: Spark's dynamic partition overwrite
  * deletes a touched partition's files before the staged replacements
  * land, so a reader scanning that partition mid-commit sees it partial
  * or empty. Here every partition directory is its own tiny [[Snapshots]]
  * table:
  *
  * {{{
  *   <table>/_partition_manifests          ← marker: partition column names
  *   <table>/d=2024-01-01/_versions/v00000001/   ← immutable partition snapshot
  *   <table>/d=2024-01-01/_versions/v00000002/
  *   <table>/d=2024-01-01/_current         ← per-partition pointer, atomic swap
  *   <table>/d=2024-01-02/...
  * }}}
  *
  * A commit touching 2 of 30 000 partitions stages its output ONCE
  * (one Spark job, `partitionBy` write into a hidden `_staging-*` root),
  * then RENAMES each staged partition dir into that partition's next
  * version slot and swaps that partition's pointer — metadata-speed,
  * nothing copied, and a racing reader of the touched partition keeps its
  * pinned (immutable) version exactly as Iceberg readers do. Untouched
  * partitions are never written, listed into staging, or repointed.
  * Partition columns stay recoverable from the `k=v` path segment above
  * `_versions` (Spark's partition parsing skips non-`k=v` segments BELOW
  * a partition segment), so a resolved read types them exactly as a flat
  * hive read would.
  *
  * Atomicity is PER PARTITION (the granularity dynamic overwrite promises
  * but does not deliver safely): a reader that lists the table while a
  * multi-partition commit is mid-flight can see partition A at the new
  * version and partition B still at the old one — never a partial
  * partition. Cross-partition atomicity remains [[Snapshots]]' whole-table
  * job; at 100 TB you pick the granularity per table, which is exactly the
  * Iceberg-style trade.
  *
  * Migration from a flat hive layout moves NOTHING: writing the marker
  * file is the whole migration. Flat partition files serve as an implicit
  * version 0 through `resolvedDataPath`'s fallback chain; the first real
  * commit to a partition supersedes them with a published snapshot (the
  * pointer swap is the only visible transition — no rename window, no
  * per-file move a racing reader could half-see), and the flat files are
  * vacuumed only once that partition has accumulated `retain` real
  * versions — the same reader-vs-expiration contract real versions get.
  * Consequence to document loudly: a legacy `spark.read.parquet(table)`
  * on a MIGRATED table keeps seeing each partition's implicit v0 until it
  * is vacuumed — increasingly stale, then empty. Route reads through
  * [[graft.operators.Upsert.read]] / [[read]].
  *
  * Known trade vs real Iceberg: resolving a read lists partition dirs
  * (one filesystem listing per level) instead of reading a manifest file;
  * object-store deployments with very high partition counts would want a
  * root-level manifest cache on top. Single-writer per table is enforced
  * by [[graft.operators.Upsert]]'s lease, as for every other layout.
  */
object PartitionSnapshots {

  private val Marker = "_partition_manifests"
  private val VersionsDir = "_versions"

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** True when `table` uses per-partition manifests (the marker file
    * exists) — the discriminator Upsert's read/commit paths route on. */
  def isManifested(spark: SparkSession, table: String): Boolean =
    fs(spark, new Path(table)).exists(new Path(table, Marker))

  /** The partition column names recorded at creation/migration time. */
  def partitionCols(spark: SparkSession, table: String): Seq[String] = {
    val p = new Path(table, Marker)
    val in = fs(spark, p).open(p)
    val s = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8).trim
    finally in.close()
    s.split(",").toSeq.filter(_.nonEmpty)
  }

  /** Flip `table` to the manifested layout (or validate the existing
    * marker against `cols`). Writing the marker IS the whole migration —
    * existing flat partitions become implicit v0 snapshots, nothing moves.
    * Call under the table's writer lease. */
  private[graft] def ensureManifested(spark: SparkSession, table: String,
                                      cols: Seq[String]): Unit = {
    val root = new Path(table)
    val f = fs(spark, root)
    f.mkdirs(root)
    if (isManifested(spark, table)) {
      val have = partitionCols(spark, table)
      require(have == cols,
        s"partition manifests at $table are keyed by $have, not $cols")
    } else {
      val p = new Path(table, Marker)
      val out = f.create(p, true)
      try out.write(cols.mkString(",")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
  }

  private def hidden(name: String): Boolean =
    name.startsWith("_") || name.startsWith(".")

  /** Does `dir` directly contain at least one visible (data) file? */
  private def hasDataFiles(spark: SparkSession, dir: Path): Boolean = {
    val f = fs(spark, dir)
    f.exists(dir) && f.listStatus(dir)
      .exists(st => st.isFile && !hidden(st.getPath.getName))
  }

  /** Relative partition paths ("d=2024-01-01", "a=1/b=2"), one per leaf:
    * visible `k=v` dirs walked `depth` levels down. */
  def partitionDirs(spark: SparkSession, table: String,
                    depth: Int): Seq[String] = {
    val root = new Path(table)
    val f = fs(spark, root)
    def walk(dir: Path, d: Int, rel: String): Seq[String] =
      if (d == 0) Seq(rel)
      else if (!f.exists(dir)) Nil
      else f.listStatus(dir)
        .filter(st => st.isDirectory && !hidden(st.getPath.getName) &&
          st.getPath.getName.contains("="))
        .toSeq.flatMap { st =>
          val n = st.getPath.getName
          walk(st.getPath, d - 1, if (rel.isEmpty) n else s"$rel/$n")
        }
    walk(root, depth, "")
  }

  /** The COMPLETE data directory for one partition, or None when the
    * partition holds no rows (dropped / empty version). Fallback chain:
    *   1. the partition's committed snapshot (pointer, else newest with
    *      _SUCCESS — [[Snapshots.currentVersion]]'s own fallback),
    *   2. a complete-but-unpublished version slot (crash between the
    *      whole-dir rename into the slot and the pointer swap; bounded
    *      staleness, never partial — the [[Snapshots]] staging contract),
    *   3. the flat hive files themselves (the implicit v0 of a migrated
    *      table that has not been committed to yet). */
  private def resolvedDataPath(spark: SparkSession, table: String,
                               rel: String): Option[String] = {
    val pt = s"$table/$rel"
    Snapshots.currentVersion(spark, pt)
      .orElse(Snapshots.allVersionDirs(spark, pt).lastOption) match {
      case Some(v) =>
        val vp = Snapshots.versionPath(pt, v)
        if (hasDataFiles(spark, new Path(vp))) Some(vp) else None
      case None =>
        if (hasDataFiles(spark, new Path(pt))) Some(pt) else None
    }
  }

  /** Read the table: each partition resolved to its committed snapshot
    * (or its implicit v0 — see `resolvedDataPath`), partition columns
    * recovered from the `k=v` path segments via `basePath`, exactly as a
    * flat hive read types them. */
  def read(spark: SparkSession, table: String): DataFrame =
    readOption(spark, table).getOrElse(
      throw new IllegalArgumentException(
        s"no committed partition snapshots at $table"))

  /** [[read]] that answers None when no partition holds any rows. */
  def readOption(spark: SparkSession, table: String): Option[DataFrame] = {
    if (!isManifested(spark, table)) return None
    val cols = partitionCols(spark, table)
    val paths = partitionDirs(spark, table, cols.size)
      .flatMap(rel => resolvedDataPath(spark, table, rel))
    if (paths.isEmpty) None
    else Some(spark.read.option("basePath", table).parquet(paths: _*))
  }

  /** Rename complete data at `from` into `pt`'s next version slot, mark
    * it committed, swap the pointer. The rename is whole-dir atomic, so
    * every published (and even every unpublished) slot holds complete
    * data. */
  private def commitDir(spark: SparkSession, pt: String, from: Path): Unit = {
    val f = fs(spark, from)
    f.mkdirs(new Path(pt, VersionsDir))
    var attempt = 0
    while (attempt < 50) {
      val next = Snapshots.allVersionDirs(spark, pt).lastOption.getOrElse(0L) + 1
      val slot = new Path(Snapshots.versionPath(pt, next))
      if (f.rename(from, slot)) {
        f.create(new Path(slot, "_SUCCESS"), true).close()
        Snapshots.publish(spark, pt, next)
        return
      }
      attempt += 1
    }
    throw new IllegalStateException(
      s"partition commit: could not claim a version slot at $pt")
  }

  /** Commit a staged `partitionBy` write: every staged partition dir is
    * renamed into that partition's next version slot and published;
    * `emptied` partitions (touched, but with zero surviving rows) get an
    * EMPTY published version — the reader-safe replacement for deleting
    * the partition dir. Per partition, after its publish: retention is
    * enforced, and the implicit-v0 flat files of a migrated table are
    * removed once `retain` real versions exist (v0 ages out of the
    * retention window like any other snapshot). */
  private[graft] def commitStaged(spark: SparkSession, table: String,
                                  stagingRoot: String, cols: Seq[String],
                                  emptied: Set[String],
                                  retainVersions: Int): Unit = {
    val f = fs(spark, new Path(table))
    val retain = math.max(1, retainVersions)
    val staged = partitionDirs(spark, stagingRoot, cols.size)
    staged.foreach { rel =>
      commitDir(spark, s"$table/$rel", new Path(s"$stagingRoot/$rel"))
      finishPartitionCommit(spark, table, rel, retain)
    }
    (emptied -- staged.toSet).foreach { rel =>
      val pt = s"$table/$rel"
      f.mkdirs(new Path(pt, VersionsDir))
      val next = Snapshots.allVersionDirs(spark, pt).lastOption.getOrElse(0L) + 1
      val slot = new Path(Snapshots.versionPath(pt, next))
      f.mkdirs(slot)
      f.create(new Path(slot, "_SUCCESS"), true).close()
      Snapshots.publish(spark, pt, next)
      finishPartitionCommit(spark, table, rel, retain)
    }
  }

  /** Post-publish hygiene for one partition: enforce snapshot retention,
    * and expire the implicit v0 (legacy flat files) once enough real
    * versions exist to cover every reader the retention window promises. */
  private def finishPartitionCommit(spark: SparkSession, table: String,
                                    rel: String, retain: Int): Unit = {
    val pd = new Path(s"$table/$rel")
    val f = fs(spark, pd)
    Snapshots.vacuum(spark, s"$table/$rel", keep = retain)
    if (Snapshots.versions(spark, s"$table/$rel").size >= retain)
      f.listStatus(pd)
        .filter(st => st.isFile && !hidden(st.getPath.getName))
        .foreach(st => f.delete(st.getPath, false))
  }

  /** Remove staging roots a crashed writer abandoned (cold ones only —
    * a live TTL-takeover victim may still be flushing its write). */
  private[graft] def cleanupStaging(spark: SparkSession, table: String,
                                    olderThanMs: Long = 15 * 60 * 1000L): Unit = {
    val root = new Path(table)
    val f = fs(spark, root)
    if (!f.exists(root)) return
    f.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("_staging-"))
      .filter(st => System.currentTimeMillis() - st.getModificationTime > olderThanMs)
      .foreach(st => f.delete(st.getPath, true))
  }
}
