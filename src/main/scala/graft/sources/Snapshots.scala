package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Snapshot versioning + time travel for Parquet warehouse tables — the
  * engine's analogue of the Iceberg snapshot features the reference's
  * README claims (reference: README.md:100-106) but never exercises in
  * code.
  *
  * Layout:
  * {{{
  *   <table>/_versions/v00000001/  ← immutable full snapshot (parquet)
  *   <table>/_versions/v00000002/
  *   <table>/_current              ← tiny pointer file, atomically swapped
  * }}}
  *
  * Each commit writes a NEW immutable version directory and then swaps the
  * pointer (write sibling tmp → delete → rename; a reader that races the
  * swap falls back to the newest complete snapshot, so there is no window
  * where the table is unreadable). Unlike Iceberg's manifest reuse, every
  * snapshot here is a full copy — simple and crash-safe, at O(table) write
  * cost per commit. That trade is right for dimension-sized tables and
  * per-partition-committed facts; for a 100 TB fact table, snapshot the
  * PARTITION directories (compose with Upsert's partition-scoped rewrite),
  * not the table root.
  *
  * Readers never list-and-guess: concurrent writers are out of scope
  * (single-writer, the reference's one-Airflow-run-at-a-time schedule),
  * but a crashed writer leaves only an orphan version dir that `vacuum`
  * collects — the pointer still names the last complete snapshot.
  */
object Snapshots {

  private val VersionsDir = "_versions"
  private val Pointer = "_current"

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def vName(v: Long) = f"v$v%08d"

  private[graft] def versionPath(table: String, v: Long) =
    s"$table/$VersionsDir/${vName(v)}"

  private val VersionName = "^v(\\d{8,})$".r

  /** Committed versions, ascending: version dirs with a _SUCCESS marker
    * (a crashed write has none and is invisible; in-flight `.staging-*`
    * dirs don't match the version-name shape at all). */
  def versions(spark: SparkSession, table: String): Seq[Long] = {
    val dir = new Path(s"$table/$VersionsDir")
    val f = fs(spark, dir)
    if (!f.exists(dir)) Nil
    else f.listStatus(dir).filter(_.isDirectory).map(_.getPath)
      .filter(p => f.exists(new Path(p, "_SUCCESS")))
      .flatMap(p => VersionName.findFirstMatchIn(p.getName).map(_.group(1).toLong))
      .toSeq.sorted
  }

  /** The pointer's version, or (pointer missing/corrupt — e.g. a reader
    * racing the swap) the newest complete snapshot. */
  def currentVersion(spark: SparkSession, table: String): Option[Long] =
    pointedVersion(spark, table).orElse(versions(spark, table).lastOption)

  /** Newest retained version committed (dir mtime) at or before
    * `tsMillis` — SQL `TIMESTAMP AS OF` resolution for whole-table
    * snapshot tables; loud when the timestamp precedes retained
    * history (see [[PartitionSnapshots.rootVersionAt]]).
    *
    * Resolution walks the RECORDED PUBLISHED LINEAGE from the current
    * head (the `_parent` marker each [[publish]] writes), exactly like
    * [[PartitionSnapshots.rootVersionAt]]'s mainLineage: a pointer
    * ceiling alone is not enough, because a commit AFTER a rollback
    * allocates max(existing)+1 — rollback(v1) then commit makes v3 with
    * the abandoned v2 still BELOW the new ceiling, and a timestamp
    * between v2's and v3's mtimes must serve v1, never the rolled-back
    * v2. Versions without a marker (pre-upgrade) fall back to the
    * legacy assumption that every lower committed version is ancestry. */
  def versionAt(spark: SparkSession, table: String, tsMillis: Long): Long = {
    val f = fs(spark, new Path(table))
    val committed = versions(spark, table)
    val head = pointedVersion(spark, table).orElse(committed.lastOption)
    val lineage = scala.collection.mutable.ArrayBuffer.empty[Long]
    val committedSet = committed.toSet
    var v: Option[Long] = head
    while (v.isDefined) {
      val cur = v.get
      if (committedSet.contains(cur)) lineage += cur
      v = parentOf(spark, table, cur) match {
        // parents are strictly decreasing by construction (a commit's
        // slot is max+1); anything else is a corrupt marker — stop
        case Some(p) if p >= 1 && p < cur => Some(p)
        case Some(_) => None // parent 0: the chain's first commit
        case None => // legacy slot: adopt all lower committed versions
          committed.filter(_ < cur).reverse.foreach(lineage += _)
          None
      }
    }
    val ok = lineage.map(lv => lv ->
      f.getFileStatus(new Path(versionPath(table, lv))).getModificationTime)
      .filter(_._2 <= tsMillis)
    require(ok.nonEmpty,
      s"versionAt: no retained snapshot at $table committed at or before " +
        s"${new java.sql.Timestamp(tsMillis)}")
    ok.maxBy(_._1)._1
  }

  /** The published-lineage parent recorded at [[publish]] time (`0` =
    * first commit); None for pre-upgrade slots that never recorded one. */
  private def parentOf(spark: SparkSession, table: String,
                       v: Long): Option[Long] = {
    val p = new Path(versionPath(table, v), ParentMarker)
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else try {
      val in = f.open(p)
      val s = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim
      finally in.close()
      Some(s.toLong)
    } catch { case _: Exception => None }
  }

  private val ParentMarker = "_parent"

  /** The pointer FILE's version only — None when the pointer is absent
    * or mid-swap, with NO newest-slot fallback. Callers that must never
    * confuse staged slots for the published state (branch-aware layers)
    * use this and choose their own fallback. */
  private[graft] def pointedVersion(spark: SparkSession,
                                    table: String): Option[Long] = {
    val p = new Path(table, Pointer)
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else try {
      val in = f.open(p)
      val s = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim
      finally in.close()
      val v = s.stripPrefix("v").toLong
      if (f.exists(new Path(versionPath(table, v)))) Some(v) else None
    } catch { case _: Exception => None }
  }

  /** Every version directory, committed or not — crashed writes (no
    * _SUCCESS) still occupy their number, so the next commit must skip
    * them rather than collide with ErrorIfExists and wedge the table. */
  private[graft] def allVersionDirs(spark: SparkSession, table: String): Seq[Long] = {
    val dir = new Path(s"$table/$VersionsDir")
    val f = fs(spark, dir)
    if (!f.exists(dir)) Nil
    else f.listStatus(dir).filter(_.isDirectory)
      .flatMap(s => VersionName.findFirstMatchIn(s.getPath.getName)
        .map(_.group(1).toLong)).toSeq.sorted
  }

  /** True when `table` uses the versioned layout (a `_versions` dir
    * exists) — the discriminator [[graft.operators.Upsert.read]] uses to
    * route between pointer-resolved and plain-parquet reads. */
  def isVersioned(spark: SparkSession, table: String): Boolean = {
    val dir = new Path(s"$table/$VersionsDir")
    fs(spark, dir).exists(dir)
  }

  /** Write `df` as the next (not-yet-published) version dir; returns its
    * number. The data lands in a unique hidden `.staging-*` dir first and
    * is then atomically RENAMED into the next free version slot — two
    * concurrent stagers (a TTL-takeover race) can never interleave files
    * in one dir, because a rename onto an existing target fails and the
    * loser renumbers. Readers cannot see the version until [[publish]]
    * swaps the pointer; the stage/publish split lets a caller re-verify
    * its write lease between the slow data write and the instant swap. An
    * abandoned staged version is a COMPLETE dataset that merely never
    * became current — the pointer-corrupt fallback may transiently serve
    * it (bounded staleness, never partial data) and vacuum collects it. */
  private[graft] def stageVersion(spark: SparkSession, table: String,
                                  df: DataFrame): Long = {
    val tmp = new Path(
      s"$table/$VersionsDir/.staging-${java.util.UUID.randomUUID()}")
    df.write.mode(SaveMode.ErrorIfExists).parquet(tmp.toString)
    val f = fs(spark, tmp)
    var attempt = 0
    while (attempt < 50) {
      val next = allVersionDirs(spark, table).lastOption.getOrElse(0L) + 1
      if (CommitIo.current.claimSlot(f, tmp,
          new Path(versionPath(table, next)))) return next
      attempt += 1 // lost the slot race; renumber against the new listing
    }
    f.delete(tmp, true)
    throw new IllegalStateException(
      s"snapshot stage: could not claim a version slot at $table after 50 tries")
  }

  /** Atomically publish a staged version: after the pointer swap every new
    * read resolves to `v`; readers mid-scan on the previous version keep
    * their (immutable) files. The version that was current at publish
    * time is recorded as `v`'s `_parent` FIRST (inside the immutable
    * version dir, so it travels with the snapshot), giving [[versionAt]]
    * the published lineage to resolve timestamps along — a crash between
    * marker and swap leaves only an unpublished dir with a marker, which
    * no lineage walk from any published head can reach. */
  private[graft] def publish(spark: SparkSession, table: String, v: Long): Unit = {
    val parent = pointedVersion(spark, table).getOrElse(0L)
    if (parent != v) { // rollback republishes an old slot; keep ITS parent
      val p = new Path(versionPath(table, v), ParentMarker)
      val f = fs(spark, p)
      val out = f.create(p, true)
      try out.write(parent.toString.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    swapPointer(spark, table, v)
  }

  /** Commit `df` as the next snapshot; returns the new version number. */
  def commit(spark: SparkSession, table: String, df: DataFrame): Long = {
    val next = stageVersion(spark, table, df)
    publish(spark, table, next)
    next
  }

  /** Read the current snapshot (time travel: pass `asOf`). Current reads
    * skip the existence re-check: [[currentVersion]] already validated the
    * pointed dir, and re-listing here would only widen the window in which
    * a racing commit+vacuum could invalidate the answer. A pinned version
    * stays scannable as long as the retention policy keeps it — the same
    * reader-vs-expiration contract as Iceberg's expire_snapshots. */
  def read(spark: SparkSession, table: String, asOf: Long = -1L): DataFrame = {
    val v =
      if (asOf > 0) asOf
      else currentVersion(spark, table).getOrElse(
        throw new IllegalArgumentException(s"no committed snapshot at $table"))
    if (asOf > 0)
      require(versions(spark, table).contains(v),
        s"snapshot v$v does not exist at $table (have ${versions(spark, table)})")
    spark.read.parquet(versionPath(table, v))
  }

  /** Keyed MERGE against the current snapshot, committed as a new version
    * (read-modify-commit; single-writer). */
  def upsert(spark: SparkSession, table: String, source: DataFrame,
             keys: Seq[String], insertOnly: Boolean = false): Long = {
    val merged = currentVersion(spark, table) match {
      case None => source
      case Some(v) => graft.operators.Upsert.merge(
        read(spark, table, v), source, keys, insertOnly)
    }
    commit(spark, table, merged)
  }

  /** Repoint the table at an older snapshot (instant, nothing rewritten —
    * later versions remain until `vacuum`). */
  def rollback(spark: SparkSession, table: String, v: Long): Unit = {
    require(versions(spark, table).contains(v),
      s"cannot roll back to missing snapshot v$v at $table")
    swapPointer(spark, table, v)
  }

  /** Delete all snapshots except the current one and the newest
    * `keep`−1 others (plus any orphan dirs from crashed writes). */
  def vacuum(spark: SparkSession, table: String, keep: Int = 2,
             extraKeep: Set[Long] = Set.empty): Unit = {
    require(keep >= 1, "vacuum must keep at least the current snapshot")
    val cur = currentVersion(spark, table).getOrElse(return)
    val all = versions(spark, table)
    val keepSet = (all.filter(_ != cur).takeRight(keep - 1) :+ cur)
      .toSet ++ extraKeep
    val dir = new Path(s"$table/$VersionsDir")
    val f = fs(spark, dir)
    f.listStatus(dir).filter(_.isDirectory)
      .filter(st => !keepSet.map(vName).contains(st.getPath.getName))
      // a fresh .staging-* dir may belong to a concurrent TTL-expired
      // stager that hasn't aborted yet — deleting it mid-write would turn
      // its clean lease-abort into an IO error; collect only cold ones
      .filter(st => VersionName.findFirstMatchIn(st.getPath.getName).nonEmpty ||
        System.currentTimeMillis() - st.getModificationTime > 15 * 60 * 1000L)
      .foreach(st => f.delete(st.getPath, true))
  }

  private def swapPointer(spark: SparkSession, table: String, v: Long): Unit = {
    val cur = new Path(table, Pointer)
    CommitIo.current.swapPointer(fs(spark, cur), cur,
      vName(v).getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}
