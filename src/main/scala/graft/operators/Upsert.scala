package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Keyed upsert over Parquet directories — the engine's replacement for the
  * reference's Iceberg `MERGE INTO` (reference:
  * spark_jobs/gcs_bronze_to_silver.py:469-490 and the 12 MERGEs in
  * spark_jobs/gcs_silver_to_gold.py).
  *
  * Plan shape (all declarative — Catalyst chooses broadcast vs shuffle):
  *   merged = dedup(source) ∪ (target ⟕anti source on keys)
  *
  * Scale design:
  *   - `MERGE` semantics are last-write-wins on the key set; both legs are a
  *     single shuffle on the key columns (or a broadcast when the source
  *     micro-batch is small — the common streaming case, which AQE picks up
  *     automatically).
  *   - With `partitionBy`, only partitions present in the source are
  *     rewritten (dynamic partition overwrite), mirroring Iceberg's
  *     partition-level commit: a daily micro-batch touching 2 dates rewrites
  *     2 partitions of a 100 TB table, not the table.
  *   - Without `partitionBy`, every merge commits a NEW immutable snapshot
  *     under `path/_versions/` and atomically swaps the `path/_current`
  *     pointer ([[graft.sources.Snapshots]]) — Iceberg-reader parity: a
  *     reader resolves the pointer to a complete, immutable version dir, so
  *     no reader ever observes a missing table or a half-written merge, no
  *     matter how it races the writer. Old versions are retained
  *     (`retainVersions`) for in-flight readers and time travel, then
  *     vacuumed — the same reader-vs-expiration contract as Iceberg's
  *     expire_snapshots. Read versioned tables with [[read]], not
  *     `spark.read.parquet(path)` (the data lives in hidden `_`-prefixed
  *     dirs a plain parquet scan ignores — deliberately: stale flat files
  *     would silently serve OLD data, an error is the honest failure).
  *
  * Why the partitioned path keeps the flat hive layout: its commit never
  * renames the table root (no whole-table FileNotFound window — the gap
  * this versioning closes for the swap path), readers of UNTOUCHED
  * partitions race nothing at all, and a touched partition's window is
  * Spark's own dynamic-overwrite commit (per-partition delete + staged
  * rename, metadata-speed). Versioning it whole-table would copy the full
  * 100 TB fact per daily merge — the exact cost Snapshots' scaladoc warns
  * against; true per-partition manifests are the documented follow-up.
  */
object Upsert {

  /** A second writer hit a live single-writer lease (see [[upsert]]'s
    * `lockTtlMs`): the table is mid-merge by someone else. Retry after the
    * holder commits, or raise the TTL if the holder is just slow. */
  final class ConcurrentWriteException(msg: String)
    extends IllegalStateException(msg)

  /** An optimistic commit ([[upsertOptimistic]] /
    * [[graft.sources.PartitionSnapshots.fastForwardRoot]] with
    * `rebase = true`) found that another writer changed a partition this
    * commit also touches since its base snapshot — retrying would
    * silently discard the winner's rows (lost update). Re-derive the
    * source from the current table state and re-submit. */
  final class CommitConflictException(msg: String)
    extends IllegalStateException(msg)

  /** Default single-writer lease TTL: generous enough for any one merge,
    * short enough that a crashed writer doesn't wedge the table for long. */
  val DefaultLockTtlMs: Long = 15 * 60 * 1000L

  /** Versions kept after each whole-table commit (current + 3 prior): a
    * reader that pinned a version stays valid until 3 further commits
    * land — at any realistic merge cadence, orders of magnitude longer
    * than a scan. Raise it for long-running readers; never below 1. */
  val DefaultRetainVersions: Int = 4

  private def lockPath(path: String) = new Path(path + "__lock")

  /** In-process lease registry: (canonical lock path → owning token).
    * Hadoop's local-FS `create(overwrite = false)` is check-then-create,
    * NOT atomic — two THREADS of one JVM racing [[acquireLock]] can both
    * "win" the file and interleave commits (the exact shape of two
    * optimistic appenders in a local[*] session). This map makes the
    * in-JVM half of the acquisition a real CAS; the lease FILE remains
    * the cross-process half (atomic on HDFS/object-store committers,
    * best-effort on a shared local FS — the documented trade). */
  private val jvmLeases =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Per-lock-key monitors serializing the WHOLE in-JVM acquire (CAS +
    * lease-file ops): the stale-TTL takeover's delete+create region is
    * non-atomic on a local FS, and two same-JVM threads could otherwise
    * both pass the CAS in sequence (B wins the entry, C replaces B's
    * entry while the FILE is still stale) and then race the file
    * takeover — both "winning" create. One monitor per key makes the
    * takeover single-threaded per process; cross-process atomicity
    * remains the lease file's (documented) trade. Bounded: one entry
    * per table path ever locked by this JVM. */
  private val lockMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def lockKey(spark: SparkSession, path: String): String = {
    val lp = lockPath(path)
    fs(spark, lp).makeQualified(lp).toUri.toString
  }

  /** Acquire the single-writer lease for the table at `path`, or throw
    * [[ConcurrentWriteException]]. The reference runs one Airflow task per
    * table per day — a contract that lived only in documentation; this
    * turns it into a checked invariant so an overlapping second writer
    * fails LOUDLY instead of corrupting the staged swap.
    *
    * Mechanics: atomic create-if-absent of a sibling `path__lock` file
    * (sibling, not child — the table dir itself is renamed during the
    * swap). A lock older than `ttlMs` is presumed crashed and taken over.
    * On HDFS/object-store committers create(overwrite=false) is atomic;
    * on the local FS it is the same check-and-create Hadoop's own commit
    * protocol relies on — adequate for the one-job-at-a-time deployments
    * this guards. */
  private[graft] def acquireLock(spark: SparkSession, path: String,
                                 ttlMs: Long): String = {
    val lp = lockPath(path)
    val f = fs(spark, lp)
    // Unique ownership token stamped INTO the lease file. Release and the
    // pre-swap ownership check compare against it, so a writer whose merge
    // outlived the TTL (and whose lease was legitimately taken over by a
    // successor) can neither delete the successor's lease on its way out
    // nor perform the destructive swap — without the token, the stale
    // writer's finally-release would silently re-open the table to a THIRD
    // writer while the successor is mid-swap.
    val token =
      s"pid=${ProcessHandle.current().pid()}-${java.util.UUID.randomUUID()}"
    def lockAge(): Long =
      try System.currentTimeMillis() - f.getFileStatus(lp).getModificationTime
      catch { case _: java.io.FileNotFoundException => Long.MaxValue }
    // in-JVM CAS first: among this process's threads exactly one wins
    // (the file create below is NOT atomic on a local FS). The whole
    // acquire — CAS and file ops — runs under the key's monitor, so the
    // stale-TTL takeover's delete+create region is single-threaded per
    // process (see [[lockMonitors]]).
    val key = lockKey(spark, path)
    lockMonitors.computeIfAbsent(key, _ => new Object).synchronized {
      val prev = jvmLeases.putIfAbsent(key, token)
      if (prev != null) {
        // entry WITHOUT a lease file = a holder mid-acquire (the gap
        // between its CAS and its create is live, never stale) — only an
        // entry whose FILE aged past the TTL is a crashed-holder takeover
        val age = lockAge()
        if (age == Long.MaxValue || age < ttlMs)
          throw new ConcurrentWriteException(
            s"upsert: table $path is locked by another writer in this " +
              s"process (lease $lp, TTL ${ttlMs / 1000}s)")
        if (!jvmLeases.replace(key, prev, token))
          throw new ConcurrentWriteException(
            s"upsert: lost in-process takeover race for stale lease $lp")
      }
      def tryCreate(): Boolean =
        graft.sources.CommitIo.current.createExclusive(f, lp,
          s"$token ts=${System.currentTimeMillis()}\n"
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      try {
        if (!tryCreate()) {
          val ageMs = lockAge()
          if (ageMs < ttlMs)
            throw new ConcurrentWriteException(
              s"upsert: table $path is locked by another writer " +
                s"(lease $lp is ${ageMs / 1000}s old, TTL ${ttlMs / 1000}s)")
          f.delete(lp, false) // stale: holder crashed past TTL; take over
          if (!tryCreate())
            throw new ConcurrentWriteException(
              s"upsert: lost takeover race for stale lease $lp")
        }
      } catch {
        case t: Throwable => jvmLeases.remove(key, token); throw t
      }
    }
    token
  }

  /** The token currently stamped in the lease file, or None if absent. */
  private def currentToken(spark: SparkSession, path: String): Option[String] = {
    val lp = lockPath(path)
    val f = fs(spark, lp)
    try {
      val in = f.open(lp)
      val content =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      content.split("\\s+").headOption.filter(_.nonEmpty)
    } catch { case _: java.io.IOException => None }
  }

  /** Throw if this writer no longer holds the lease — called immediately
    * before each destructive commit (rename swap / dynamic overwrite), so
    * a TTL takeover during a slow merge aborts the old writer instead of
    * letting two writers interleave renames on the same directory. */
  private[graft] def assertHeld(spark: SparkSession, path: String,
                                token: String): Unit = {
    val held = currentToken(spark, path)
    if (!held.contains(token))
      throw new ConcurrentWriteException(
        s"upsert: lease for $path was taken over mid-merge " +
          s"(held=${held.getOrElse("<gone>")}, mine=$token); aborting before " +
          "the commit — this writer exceeded the lock TTL")
  }

  /** Delete the lease ONLY if `token` still owns it: releasing
    * unconditionally would let a TTL-expired writer's finally-block delete
    * its successor's live lease. */
  private[graft] def releaseLock(spark: SparkSession, path: String,
                                 token: String): Unit = {
    val lp = lockPath(path)
    // entry BEFORE file (inverse of acquire): deleting the file first
    // would leave an entry-present/file-missing window another thread
    // misreads as a holder mid-acquire ("never stale") and refuses on
    // — a spurious conflict on an unheld lock
    jvmLeases.remove(lockKey(spark, path), token)
    if (currentToken(spark, path).contains(token))
      fs(spark, lp).delete(lp, false)
  }

  /** Iceberg's `write.target-file-size-bytes`, for the STAGED hive
    * writes behind every commit flavor. With the session conf
    * `graft.write.targetFileSizeBytes` set (> 0), a staged write is
    * (1) repartitioned BY its partition columns — a dir's rows land in
    * ONE task, so the write produces one file per dir instead of one
    * per (task × dir), the 65k-tiny-file seed shape the round-12 drill
    * measured at ~85% of seed wall time (per-file writer init, not the
    * committer) — and (2) rolled at `maxRecordsPerFile` = target /
    * bytes-per-row, so a single big dir still splits at the byte
    * target: total file count = Σ_dirs ⌈dir bytes / target⌉.
    * Bytes-per-row comes from `graft.write.bytesPerRowHint` when set,
    * else from ONE bounded sampled parquet write measured once per
    * call. The knob UNSET means the write is untouched (no added
    * shuffle): small-commit latency and spec-pinned file layouts keep
    * their exact behavior — the knob is the bulk-ingest/seed switch a
    * 100 TB backfill flips on. */
  private[graft] def packForWrite(spark: SparkSession, df: DataFrame,
                                  partitionCols: Seq[String])
      : (DataFrame, Option[Long]) = {
    val target = spark.conf.getOption("graft.write.targetFileSizeBytes")
      .map(_.toLong).getOrElse(0L)
    if (target <= 0 || partitionCols.isEmpty) (df, None)
    else {
      val bpr = spark.conf.getOption("graft.write.bytesPerRowHint")
        .map(_.toLong).filter(_ > 0)
        .getOrElse(measureBytesPerRow(spark, df))
      val maxRecs = math.max(1L, target / math.max(1L, bpr))
      (df.repartition(partitionCols.map(
        org.apache.spark.sql.functions.col): _*), Some(maxRecs))
    }
  }

  /** Measured (not guessed) bytes-per-row: ONE ≤20k-row sample written
    * as parquet and sized from the files themselves — dictionary and
    * encoding effects included, which a schema-defaultSize estimate
    * misses by multiples on text-heavy corpora. */
  private def measureBytesPerRow(spark: SparkSession, df: DataFrame): Long = {
    val tmpRoot = java.nio.file.Files.createTempDirectory("graft_bpr")
    val tmp = new Path(tmpRoot.toString, "sample")
    val f = fs(spark, tmp)
    try {
      df.limit(20000).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      val files = f.listStatus(tmp)
        .filter(_.getPath.getName.endsWith(".parquet"))
      val bytes = files.map(_.getLen).sum
      val rows = spark.read.parquet(tmp.toString).count()
      if (rows <= 0L) 64L else math.max(1L, bytes / rows)
    } finally f.delete(new Path(tmpRoot.toString), true)
  }

  /** `df.write` with the pack applied — shared by every staging site. */
  private[graft] def packedWriter(spark: SparkSession, df: DataFrame,
                                  partitionCols: Seq[String],
                                  mode: SaveMode)
      : org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row] = {
    val (packed, maxRecs) = packForWrite(spark, df, partitionCols)
    val w = packed.write.mode(mode)
    maxRecs.foreach(n => w.option("maxRecordsPerFile", n))
    w
  }

  /** Deterministic per-key winner among duplicate source rows: the row
    * with the greatest xxhash64 of its non-key columns. dropDuplicates
    * keeps an arbitrary partition-order-dependent row, which would make
    * replayed merges (and the driver's hash checks) nondeterministic. */
  private[graft] def dedupSource(source: DataFrame, keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number, xxhash64}
    val nonKey = source.columns.filterNot(keys.contains)
    if (nonKey.isEmpty) source.dropDuplicates(keys)
    else {
      val w = Window.partitionBy(keys.map(col): _*)
        .orderBy(xxhash64(nonKey.toIndexedSeq.map(col): _*).desc)
      source.withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1).drop("__rn")
    }
  }

  /** In-memory merge (pure plan; no IO) — the algebra of MERGE as DataFrames.
    * `insertOnly=true` is the reference's WHEN NOT MATCHED INSERT-only
    * variant for link tables (gcs_bronze_to_silver.py:485-490). */
  def merge(target: DataFrame, source: DataFrame, keys: Seq[String],
            insertOnly: Boolean = false): DataFrame = {
    val src = dedupSource(source, keys)
    if (insertOnly) target.unionByName(src.join(target, keys, "left_anti"))
    else src.unionByName(target.join(src, keys, "left_anti"))
  }

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def tableExists(spark: SparkSession, path: String): Boolean =
    fs(spark, new Path(path)).exists(new Path(path))

  /** Read an Upsert-maintained table: versioned layouts resolve the
    * `_current` pointer to an immutable snapshot dir (never racing a
    * writer); legacy flat layouts and partitioned tables fall through to a
    * plain parquet read. This is THE read path for upsert tables — a raw
    * `spark.read.parquet(path)` on a versioned table sees no data files
    * (they live under hidden `_versions/`). */
  def read(spark: SparkSession, path: String): DataFrame =
    if (graft.sources.Snapshots.isVersioned(spark, path))
      graft.sources.Snapshots.read(spark, path)
    else if (graft.sources.PartitionSnapshots.isManifested(spark, path))
      graft.sources.PartitionSnapshots.read(spark, path)
    else spark.read.parquet(path)

  /** [[read]] that answers None instead of throwing when the table is
    * absent, empty, or has no committed version yet. */
  def readOption(spark: SparkSession, path: String): Option[DataFrame] =
    readTable(spark, path).map(
      graft.sources.PartitionSnapshots.dropHidden(spark, path, _))

  /** Best-effort read of an existing table; None when the dir is absent,
    * no version has been committed, or a flat dir holds no readable
    * footers (e.g. an aborted empty write left only _SUCCESS behind —
    * schema inference would throw). INTERNAL: manifested tables keep
    * their hidden transform dir columns (the merge legs select them) —
    * public callers go through [[readOption]], which strips them. */
  private def readTable(spark: SparkSession, path: String): Option[DataFrame] =
    if (!tableExists(spark, path)) None
    else if (graft.sources.Snapshots.isVersioned(spark, path))
      graft.sources.Snapshots.currentVersion(spark, path)
        .map(v => graft.sources.Snapshots.read(spark, path, asOf = v))
    else if (graft.sources.PartitionSnapshots.isManifested(spark, path))
      graft.sources.PartitionSnapshots.readRawOption(spark, path)
    else try Some(spark.read.parquet(path))
    catch { case _: org.apache.spark.sql.AnalysisException => None }

  /** Additive schema evolution (the Iceberg mergeSchema analogue): align
    * target and source to the union of their columns, NULL-filling the
    * side that lacks one. Column TYPE changes are rejected loudly — a
    * silent cast would corrupt 100 TB before anyone noticed. Because the
    * merge replaces whole rows, a matched key whose source row lacks a
    * target-only column reads NULL afterwards (document-replace semantics,
    * not per-column UPDATE SET). */
  private def align(target: DataFrame, src: DataFrame): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.{col, lit}
    val tf = target.schema.fields.map(f => f.name -> f.dataType).toMap
    val sf = src.schema.fields.map(f => f.name -> f.dataType).toMap
    val conflicts = tf.keySet.intersect(sf.keySet).filter(c => tf(c) != sf(c))
    require(conflicts.isEmpty,
      s"upsert schema evolution: type change not supported for ${conflicts.toSeq.sorted}")
    val outCols = target.schema.fieldNames ++
      src.schema.fieldNames.filterNot(tf.contains)
    def conform(df: DataFrame, have: Map[String, org.apache.spark.sql.types.DataType],
                other: Map[String, org.apache.spark.sql.types.DataType]) =
      df.select(outCols.toIndexedSeq.map(c =>
        if (have.contains(c)) col(c) else lit(null).cast(other(c)).as(c)): _*)
    (conform(target, tf, sf), conform(src, sf, tf))
  }

  /** Upsert `source` into the Parquet table at `path` on `keys`. An empty
    * source is a no-op (a micro-batch of only-invalid rows must not clobber
    * the table with an unreadable empty directory). With `evolveSchema`,
    * new source columns are added to the table (see [[align]]); without it
    * a schema drift fails the merge loudly (the reference's fixed-DDL
    * behavior). */
  /** `audit` (write-audit-publish, manifested tables only): runs against
    * the complete would-be post-merge snapshot BEFORE anything is
    * published; must return an [[Expectations.check]]-style report with
    * a `passed` column. Any failed rule aborts the commit with
    * [[graft.sources.PartitionSnapshots.AuditFailedException]] and the
    * table stays byte-for-byte unchanged. */
  def upsert(spark: SparkSession, path: String, source: DataFrame,
             keys: Seq[String], insertOnly: Boolean = false,
             partitionCols: Seq[String] = Nil,
             evolveSchema: Boolean = false,
             lockTtlMs: Long = DefaultLockTtlMs,
             retainVersions: Int = DefaultRetainVersions,
             partitionManifests: Boolean = false,
             audit: Option[DataFrame => DataFrame] = None,
             branch: Option[String] = None): Unit = {
    require(partitionCols.nonEmpty || !partitionManifests,
      "upsert: partitionManifests requires partitionCols")
    require(audit.isEmpty || partitionManifests ||
      (partitionCols.nonEmpty &&
        graft.sources.PartitionSnapshots.isManifested(spark, path)),
      "upsert: audit (write-audit-publish) requires a manifested table " +
        "(partitionManifests = true, or a table already carrying manifests)")
    require(branch.isEmpty || (partitionCols.nonEmpty &&
      graft.sources.PartitionSnapshots.isManifested(spark, path)),
      "upsert: branch commits require an existing manifested table")
    require(branch.isEmpty || audit.isEmpty,
      "upsert: pass audit OR branch — a branch IS the multi-commit " +
        "audit staging (validate with readBranch, then fastForwardRoot)")
    val src0 = dedupSource(source, keys)
    if (src0.isEmpty) return
    val token = acquireLock(spark, path, lockTtlMs)
    try upsertLocked(spark, path, src0, keys, insertOnly, partitionCols,
      evolveSchema, token, retainVersions, partitionManifests, audit, branch)
    finally releaseLock(spark, path, token)
  }

  /** OPTIMISTIC multi-writer upsert — Iceberg's commit retry loop for
    * writers touching DISJOINT partitions. [[upsert]] fails fast on a
    * live lease (the reference's one-job-per-table contract); this
    * variant instead (1) WAITS for the lease with bounded backoff, then
    * (2) under the lease, VALIDATES its touched-partition set against
    * everything committed since `baseVersion` (the snapshot this
    * writer's source logically derives from — defaults to the head at
    * call time) and (3) commits rebased onto the new head. Two daily
    * jobs landing different dates of one table both commit, in a
    * linearizable root chain; a writer whose partitions OVERLAP a
    * winning commit throws [[CommitConflictException]] LOUDLY —
    * retrying it blindly would document-replace keys the winner just
    * updated (lost update), so the caller must re-derive its source
    * from the current state first.
    *
    * Conflict granularity is the partition (Iceberg's
    * validation-by-partition for overwrite commits): a changed rel
    * conflicts when its dir segments agree with ANY touched partition
    * tuple on the rel's own columns — covering current-spec rels
    * (exact match) and retired-spec parents (prefix match) alike; a
    * changed rel whose layout is incomparable to this writer's spec is
    * treated as a conflict rather than proven disjoint. Manifested
    * tables only: the root-manifest history is what validation reads
    * (two metadata resolutions, zero data files). */
  def upsertOptimistic(spark: SparkSession, path: String, source: DataFrame,
                       keys: Seq[String],
                       partitionCols: Seq[String],
                       insertOnly: Boolean = false,
                       evolveSchema: Boolean = false,
                       baseVersion: Option[Long] = None,
                       maxWaitMs: Long = 120000L,
                       lockTtlMs: Long = DefaultLockTtlMs,
                       retainVersions: Int = DefaultRetainVersions): Unit = {
    import graft.sources.PartitionSnapshots
    require(partitionCols.nonEmpty,
      "upsertOptimistic: partitionCols required (conflicts validate at " +
        "partition granularity)")
    require(PartitionSnapshots.isManifested(spark, path),
      s"upsertOptimistic: $path is not a manifested table — the root " +
        "manifest history is what commit validation reads")
    val base = baseVersion.orElse(
      PartitionSnapshots.currentRootVersion(spark, path)).getOrElse(
      throw new IllegalArgumentException(
        s"upsertOptimistic: no committed root at $path"))
    val src0 = dedupSource(source, keys)
    if (src0.isEmpty) return
    // bounded lease wait: the winner is seconds away from its
    // metadata-speed commit — spin with backoff instead of failing fast
    val token = acquireLockWaiting(spark, path, lockTtlMs, maxWaitMs)
    try {
      val head = PartitionSnapshots.currentRootVersion(spark, path).get
      if (head != base) {
        val changed =
          PartitionSnapshots.changedPartitions(spark, path, base, head)
        import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        import org.apache.spark.sql.functions.col
        // partitions THIS merge rewrites: the source's own target
        // partitions, plus (for keyed merges) the partitions its matched
        // keys currently live in — the same bounded per-touched-partition
        // collect the merge itself performs
        val srcC = PartitionSnapshots.applyTransforms(spark, path, src0)
        // the base-snapshot leg resolves manifests and partition version
        // dirs at the writer's base root; retention racing this writer
        // can expire either between the head check and here. That is a
        // RETRYABLE conflict (re-read, re-derive, re-submit), not
        // corruption — surface it as the conflict contract, never a bare
        // missing-version/missing-file error the caller can't classify.
        def baseExpired(t: Throwable): Boolean = t != null && (
          t.isInstanceOf[java.io.FileNotFoundException] ||
          t.isInstanceOf[IllegalArgumentException] &&
            String.valueOf(t.getMessage).contains("does not exist") ||
          baseExpired(t.getCause))
        def orConflict[A](body: => A): A =
          try body catch {
            case t: Throwable if baseExpired(t) =>
              throw new CommitConflictException(
                s"upsertOptimistic: base snapshot v$base at $path expired " +
                  "mid-validation (retention reaped it); re-read the " +
                  s"current table state and retry — cause: ${t.getMessage}")
          }
        val touchedDf = orConflict {
          val own = srcC.select(partitionCols.map(col): _*).distinct()
          if (insertOnly) own
          else {
            // same stats-pruned matched-key lookup as the merge itself:
            // only partitions whose bounds can contain a source key are
            // constructed and scanned for the conflict validation
            def matchedLeg(asOf: Long): DataFrame = {
              val pred = PartitionSnapshots.pinnedMergeKeyField(
                  spark, path, asOf, keys)
                .flatMap(f => PartitionSnapshots.keyExclusion(
                  spark, srcC, f.name, f.dataType,
                  PartitionSnapshots.fieldAliases(f)))
              val frame =
                (pred, PartitionSnapshots.rootManifest(spark, path, asOf)) match {
                  case (Some(p), Some(entries)) =>
                    val stats = PartitionSnapshots.rootStats(spark, path, asOf)
                    val kept = entries.keySet.filter(rel =>
                      stats.get(rel).forall(ps => !p(ps)))
                    if (kept.isEmpty) None
                    else PartitionSnapshots.readPartitionsRaw(spark, path,
                      kept, asOf)
                  case _ => PartitionSnapshots.readRawOption(spark, path,
                    asOf)
                }
              frame.map(_.join(srcC.select(keys.map(col): _*).distinct(),
                  keys, "left_semi")
                .select(partitionCols.map(col): _*).distinct())
                .getOrElse(own.limit(0))
            }
            // lookup at BOTH ends of the validation interval: the head
            // alone would miss a key the winner DELETED (or moved away)
            // from a partition this writer's stale-derived source still
            // updates — no current-state match, commit proceeds, the
            // winner's delete is silently undone. Locating the key at
            // the writer's BASE snapshot puts its old partition in the
            // touched set, where the winner's change to it conflicts —
            // serializable validation (Iceberg's delete-conflict check),
            // not just snapshot isolation.
            own.unionByName(matchedLeg(head)).unionByName(matchedLeg(base))
              .distinct()
          }
        }
        val tupleSegs: Seq[Map[String, String]] =
          orConflict(touchedDf.collect().toSeq).map { r =>
            partitionCols.zip(r.toSeq).map { case (c, v) =>
              val dirVal =
                if (v == null) ExternalCatalogUtils.DEFAULT_PARTITION_NAME
                else ExternalCatalogUtils.escapePathName(v.toString)
              c -> s"${ExternalCatalogUtils.escapePathName(c)}=$dirVal"
            }.toMap
          }
        val overlap = changed.filter { rel =>
          val cols = PartitionSnapshots.relCols(rel)
          if (!cols.forall(partitionCols.contains)) true // unprovable → conflict
          else tupleSegs.exists(m => rel.split("/").toSeq.zip(cols)
            .forall { case (seg, c) => m.get(c).contains(seg) })
        }
        if (overlap.nonEmpty)
          throw new CommitConflictException(
            s"upsertOptimistic: another writer changed " +
              s"${overlap.size} partition(s) this merge also touches " +
              s"since base v$base (head v$head): " +
              s"${overlap.sorted.take(8).mkString(", ")} — re-derive the " +
              "source from the current table state and re-submit")
        // disjoint: the ordinary locked merge against the CURRENT head
        // IS the rebase — staged slots land on top of the winner's root
      }
      upsertLocked(spark, path, src0, keys, insertOnly, partitionCols,
        evolveSchema, token, retainVersions, partitionManifests = true)
    } finally releaseLock(spark, path, token)
  }

  private def upsertLocked(spark: SparkSession, path: String, src0: DataFrame,
                           keys: Seq[String], insertOnly: Boolean,
                           partitionCols: Seq[String],
                           evolveSchema: Boolean, token: String,
                           retainVersions: Int,
                           partitionManifests: Boolean = false,
                           audit: Option[DataFrame => DataFrame] = None,
                           branch: Option[String] = None): Unit = {
    import graft.sources.PartitionSnapshots
    recoverSwap(spark, path)
    if (partitionCols.nonEmpty)
      require(!graft.sources.Snapshots.isVersioned(spark, path),
        s"upsert: $path is a versioned (whole-table snapshot) table; " +
          "partition-scoped rewrite applies only to flat hive-layout tables")
    else
      // mirror of the guard above: the whole-table snapshot commit ends in
      // cleanupFlatFiles, which removes every non-hidden root entry — on a
      // manifested table that is all the k=v partition dirs and their
      // immutable _versions history, while the root manifest survives and
      // points at deleted paths. Refuse loudly instead.
      require(!PartitionSnapshots.isManifested(spark, path),
        s"upsert: $path carries partition manifests; pass its partition " +
          "columns (whole-table snapshot commits would destroy the " +
          "per-partition snapshot history)")
    // sticky opt-in: once a table carries manifests, every later upsert
    // commits through them — a flag forgotten on one call must not demote
    // the table back to unsafe dynamic-overwrite commits
    val manifested = partitionCols.nonEmpty &&
      (partitionManifests || PartitionSnapshots.isManifested(spark, path))
    if (manifested) {
      // zero-IO migration: the marker flip makes flat partitions implicit
      // v0 snapshots; nothing moves until each partition's first commit
      PartitionSnapshots.ensureManifested(spark, path, partitionCols)
      PartitionSnapshots.cleanupStaging(spark, path)
    }
    def commitManifested(staging: String, emptied: Set[String],
                         schema: org.apache.spark.sql.types.StructType): Unit =
      audit match {
        case Some(a) => PartitionSnapshots.commitStagedAudited(spark, path,
          staging, partitionCols, emptied, retainVersions, a, Some(schema))
        case None => PartitionSnapshots.commitStaged(spark, path, staging,
          partitionCols, emptied, retainVersions, Some(schema), branch)
      }
    // hidden-partitioning: derive any transform dir columns the caller's
    // frame cannot know about — computed once here at write time, hidden
    // again by every public read (no-op for untransformed tables)
    val srcT =
      if (manifested) PartitionSnapshots.applyTransforms(spark, path, src0)
      else src0
    // a branch merge targets the BRANCH head's snapshot, never main
    val branchHead: Option[Long] = branch.map(n =>
      PartitionSnapshots.rootBranches(spark, path).getOrElse(n,
        throw new IllegalArgumentException(
          s"upsert: no branch '$n' at $path — createBranch first")))
    // manifest of the target line (None for flat hive tables / a
    // manifested table before its first root commit) — drives the
    // metadata-only existence probe, the stats-pruned key lookup, and
    // the file-scoped planner
    val base: Option[Map[String, String]] =
      if (!manifested) None
      else branchHead match {
        case Some(v) => PartitionSnapshots.rootManifest(spark, path, v)
        case None => PartitionSnapshots.rootManifest(spark, path)
      }
    // LAZY full-table frame: merely CONSTRUCTING a multi-path DataFrame
    // eagerly lists every data file (~2 s at 1k partitions, ~29 s at
    // 65k files — PLANS round-11 drill). Manifested fast paths answer
    // from metadata + pruned partition reads and never force this;
    // schema evolution, flat tables, and non-prunable keys still do.
    lazy val existing = branchHead match {
      case Some(v) => PartitionSnapshots.readRawOption(spark, path, asOf = v)
      case None => readTable(spark, path)
    }
    val tableIsEmpty = base match {
      case Some(entries) =>
        !entries.values.exists(PartitionSnapshots.stateHasData)
      case None => existing.isEmpty
    }
    if (tableIsEmpty) {
      if (manifested) {
        val staging = s"$path/_staging-${java.util.UUID.randomUUID()}"
        packedWriter(spark, srcT, partitionCols, SaveMode.ErrorIfExists)
          .partitionBy(partitionCols: _*).parquet(staging)
        try {
          assertHeld(spark, path, token)
          commitManifested(staging, Set.empty, srcT.schema)
        } finally fs(spark, new Path(staging)).delete(new Path(staging), true)
      } else if (partitionCols.nonEmpty) {
        srcT.write.mode(SaveMode.Overwrite)
          .partitionBy(partitionCols: _*).parquet(path)
      } else commitVersion(spark, path, srcT, token, retainVersions)
      return
    }
    // schema evolution must inspect and conform the real frame — it
    // forces the listing; every other path defers
    val aligned = if (evolveSchema) Some(align(existing.get, srcT)) else None
    lazy val target: DataFrame = aligned.map(_._1).getOrElse(existing.get)
    val src = aligned.map(_._2).getOrElse(srcT)
    import org.apache.spark.sql.functions.{broadcast, col}
    // the full ROW schema without constructing the frame: the pinned
    // union schema (data columns) + promoted spec columns + partition
    // columns as the SOURCE types them (the writer's own types — dir
    // values re-render identically). Exactly the shape readEntries
    // serves. Falls back to the real frame when nothing is pinned.
    val targetSchema: org.apache.spark.sql.types.StructType =
      if (!manifested || evolveSchema || base.isEmpty) target.schema
      else PartitionSnapshots.mergeReadSchema(spark, path, branchHead,
        src.schema, partitionCols).getOrElse(target.schema)
    val prunableKey =
      if (partitionCols.isEmpty) None
      else keys.find { k =>
        !partitionCols.contains(k) &&
          (targetSchema.find(_.name == k).map(_.dataType) match {
            case Some(org.apache.spark.sql.types.ByteType |
                      org.apache.spark.sql.types.ShortType |
                      org.apache.spark.sql.types.IntegerType |
                      org.apache.spark.sql.types.LongType |
                      org.apache.spark.sql.types.FloatType |
                      org.apache.spark.sql.types.DoubleType |
                      org.apache.spark.sql.types.StringType) => true
            case _ => false
          })
      }
    // computed ONCE; reused by the stats-pruned lookup here, the
    // insert-only anti-join, and the file-scoped planner below (the
    // shared exclusion builder runs small src aggregates + a bounded
    // ≤100k distinct-key collect — see PartitionSnapshots.keyExclusion)
    val keyPred: Option[
        graft.sources.PartitionSnapshots.PartStats => Boolean] =
      if (manifested)
        prunableKey.flatMap(kc => PartitionSnapshots.keyExclusion(
          spark, src, kc, targetSchema(kc).dataType,
          PartitionSnapshots.fieldAliases(targetSchema(kc))))
      else None
    // STATS-PRUNED matched-key lookup: the semi/anti-join that finds
    // matched keys is the dominant cost of a small MERGE into a big
    // table (measured: ~29 s of a 29 s single-key merge at 65k files —
    // PLANS round-11 drill; construction alone lists every file).
    // Partitions whose manifest key bounds PROVABLY exclude every
    // source key cannot hold a match — construct a frame over only the
    // remainder. Margin-safe by construction: the exclusion predicates
    // are the file-scoped planner's own (ulp margins, ASCII-only
    // strings), a partition with ABSENT stats is always kept, and a
    // pruned-to-nothing lookup just means a pure-insert batch (an
    // EMPTY schema-typed frame — never a full listing).
    lazy val lookupTarget: DataFrame = (for {
      entries <- base
      pred <- keyPred
    } yield {
      val stats = PartitionSnapshots.rootStats(spark, path,
        branchHead.getOrElse(-1L))
      val kept = entries.keySet
        .filter(rel => stats.get(rel).forall(ps => !pred(ps)))
      if (kept.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          targetSchema)
      else PartitionSnapshots.readPartitionsRaw(spark, path, kept,
        branchHead.getOrElse(-1L)).getOrElse(
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          targetSchema))
    }).getOrElse(target)
    if (manifested && insertOnly && audit.isEmpty) {
      // WHEN NOT MATCHED INSERT on a manifested table is a fast APPEND:
      // only the genuinely-new keys' rows are staged and sealed as new
      // version parts — no touched partition is rewritten, commit cost
      // is O(new rows) however large the partitions already are. The
      // anti-join runs against the stats-PRUNED frame: a key living in
      // an excluded partition cannot match, so it survives the anti-join
      // exactly as it would against the full table.
      val newRows = src.join(lookupTarget, keys, "left_anti")
      if (newRows.isEmpty) return
      val staging = s"$path/_staging-${java.util.UUID.randomUUID()}"
      packedWriter(spark, newRows, partitionCols, SaveMode.ErrorIfExists)
        .partitionBy(partitionCols: _*).parquet(staging)
      try {
        assertHeld(spark, path, token)
        PartitionSnapshots.commitAppendStaged(spark, path, staging,
          partitionCols, retainVersions, Some(src.schema), branch = branch)
      } finally fs(spark, new Path(staging)).delete(new Path(staging), true)
      return
    }
    if (partitionCols.nonEmpty) {
      // Timestamp partition values are formatted by the writer with a
      // pattern Row.toString doesn't reproduce — reject them loudly
      // instead of silently missing the emptied-partition delete below.
      // (Partition by the derived DATE instead, as the pipeline does.)
      targetSchema.fields.filter(f => partitionCols.contains(f.name)).foreach { f =>
        require(f.dataType != org.apache.spark.sql.types.TimestampType &&
          f.dataType != org.apache.spark.sql.types.TimestampNTZType,
          s"upsert: timestamp-typed partition column '${f.name}' is not supported")
      }
      // Partition-scoped rewrite. Touched partitions = partitions the
      // source writes into ∪ partitions where a matched key currently
      // lives — without the second leg a key whose partition value changes
      // (e.g. an article's corrected publish date) would survive in its
      // old partition as a duplicate. Finding matched keys scans only the
      // key+partition columns of the (stats-pruned) target, the same key
      // lookup an Iceberg MERGE performs.
      val touched = src.select(partitionCols.map(col): _*).distinct()
        .unionByName(lookupTarget
          .join(src.select(keys.map(col): _*).distinct(), keys, "left_semi")
          .select(partitionCols.map(col): _*).distinct())
        .distinct()
      // materialize the touched-partition list BEFORE the overwrite — its
      // plan reads target files the overwrite is about to delete.
      // Directory names go through the same escaping Spark's writer uses
      // (ExternalCatalogUtils): NULL → __HIVE_DEFAULT_PARTITION__, and
      // URL-escaped specials (space, ':', '%') match the on-disk name —
      // a raw "$c=$v" would silently miss them and leave stale rows.
      import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      def partDirs(rows: Array[org.apache.spark.sql.Row]): Set[String] =
        rows.map(r => partitionCols.zip(r.toSeq)
          .map { case (c, v) =>
            val dirVal =
              if (v == null) ExternalCatalogUtils.DEFAULT_PARTITION_NAME
              else ExternalCatalogUtils.escapePathName(v.toString)
            s"${ExternalCatalogUtils.escapePathName(c)}=$dirVal"
          }.mkString("/")).toSet
      val touchedRows = touched.collect()
      val touchedDirs = partDirs(touchedRows)
      def mkMerged(affected: DataFrame): DataFrame =
        if (insertOnly) affected.unionByName(src.join(affected, keys, "left_anti"))
        else src.unionByName(affected.join(src, keys, "left_anti"))
      if (manifested) {
        // partitions under RETIRED specs (the table's partition spec was
        // evolved): a manifest rel whose own layout is a proper prefix of
        // the current spec may hold matched keys — it is touched when its
        // dir segments agree with some touched tuple on the rel's OWN
        // columns. Its intersecting files rewrite (re-staged under the
        // NEW spec — Iceberg's lazy migration); the rest survive in place.
        val tupleSegs: Seq[Map[String, String]] = touchedRows.toSeq.map { r =>
          partitionCols.zip(r.toSeq).map { case (c, v) =>
            val dirVal =
              if (v == null) ExternalCatalogUtils.DEFAULT_PARTITION_NAME
              else ExternalCatalogUtils.escapePathName(v.toString)
            c -> s"${ExternalCatalogUtils.escapePathName(c)}=$dirVal"
          }.toMap
        }
        val legacyTouched: Set[String] = base.map(_.collect {
          case (rel, state) if state != "EMPTY" &&
            PartitionSnapshots.relCols(rel) != partitionCols &&
            PartitionSnapshots.relCols(rel).forall(partitionCols.contains) &&
            tupleSegs.exists(m => rel.split("/").toSeq
              .zip(PartitionSnapshots.relCols(rel))
              .forall { case (seg, c) => m.get(c).contains(seg) }) => rel
        }.toSet).getOrElse(Set.empty)
        val allTouched = touchedDirs ++ legacyTouched
        // FILE-SCOPED MERGE (Iceberg file-level rewrite): within each
        // touched partition only the files whose manifest-recorded key
        // bounds can contain a source key are read and rewritten; the
        // rest survive as file-scoped state tokens — their bytes, paths,
        // and mtimes untouched. Engaged when a prunable non-partition
        // key column exists — NUMERIC (interval + point-set tests,
        // ulp-margin-safe) or STRING (the reference's sha-256 hex IDs:
        // footer bounds are exact-or-widened and pure-ASCII bounds
        // compare byte-identically on both sides) — and the commit
        // isn't a WAP audit (which validates whole would-be snapshots).
        // Falls back to the whole-partition rewrite otherwise. A table
        // with retired-spec partitions ALWAYS routes through the
        // path-explicit planner (a nothing-excluded predicate when the
        // key is not prunable): old-spec rows are read from their own
        // dirs and re-staged under the current spec, never left behind.
        // prunableKey / keyPred are hoisted above `touched` (they also
        // drive the stats-pruned matched-key lookup); keyPred = None
        // with a prunable key present means all-NULL or non-ASCII keys
        val fileScoped: Option[(Map[String, Seq[(String, Seq[String])]],
                                Option[DataFrame])] =
          (base, prunableKey) match {
            case (Some(bm), Some(kc)) if audit.isEmpty =>
              keyPred match {
                case Some(pred) => Some(PartitionSnapshots.planFileScoped(
                  spark, path, bm, allTouched, pred, Some(targetSchema)))
                case None if legacyTouched.nonEmpty =>
                  Some(PartitionSnapshots.planFileScoped(spark, path, bm,
                    allTouched, _ => false, Some(targetSchema)))
                case None => None // all-NULL keys match nothing
              }
            case (Some(bm), _) if legacyTouched.nonEmpty =>
              // nothing-excluded predicate: no survivors — the whole-
              // partition rewrite, but read path-explicitly so retired-
              // spec dirs never mix layouts in one scan
              Some(PartitionSnapshots.planFileScoped(spark, path, bm,
                allTouched, _ => false, Some(targetSchema)))
            case _ => None
          }
        val (survivors, merged) = fileScoped match {
          case Some((surv, rewriteDf)) =>
            (surv, mkMerged(rewriteDf.getOrElse(
              spark.createDataFrame(
                spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                targetSchema))))
          case None =>
            (Map.empty[String, Seq[(String, Seq[String])]],
              mkMerged(target.join(broadcast(touched), partitionCols,
                "left_semi")))
        }
        // stage ONCE (hive layout, partition cols stripped into dirs), then
        // rename each staged partition dir into its version slot + swap
        // that partition's pointer — readers of a touched partition keep
        // their pinned immutable version; partitions that lost every row
        // publish an EMPTY version instead of a reader-visible delete
        val staging = s"$path/_staging-${java.util.UUID.randomUUID()}"
        packedWriter(spark, merged, partitionCols, SaveMode.ErrorIfExists)
          .partitionBy(partitionCols: _*).parquet(staging)
        try {
          assertHeld(spark, path, token) // last check before the commits
          audit match {
            case Some(a) => PartitionSnapshots.commitStagedAudited(spark,
              path, staging, partitionCols, allTouched, retainVersions, a,
              Some(merged.schema))
            case None => PartitionSnapshots.commitStaged(spark, path,
              staging, partitionCols, allTouched, retainVersions,
              Some(merged.schema), branch, survivors)
          }
        } finally fs(spark, new Path(staging)).delete(new Path(staging), true)
        return
      }
      val affected = target.join(broadcast(touched), partitionCols, "left_semi")
      val merged = mkMerged(affected)
      val staged = stage(spark, path, merged)
      try {
        val stagedDirs = partDirs(spark.read.parquet(staged)
          .select(partitionCols.map(col): _*).distinct().collect())
        assertHeld(spark, path, token) // last check before destructive commit
        spark.read.parquet(staged)
          .write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy(partitionCols: _*).parquet(path)
        // Dynamic overwrite only rewrites partitions present in the output;
        // a touched partition that lost ALL its rows must be dropped
        // explicitly or its stale files survive.
        (touchedDirs -- stagedDirs)
          .foreach(p => fs(spark, new Path(path)).delete(new Path(s"$path/$p"), true))
      } finally fs(spark, new Path(staged)).delete(new Path(staged), true)
    } else {
      commitVersion(spark, path, merge(target, src, keys, insertOnly), token,
        retainVersions)
    }
  }

  /** Commit `df` (whose plan may read the table's CURRENT version or its
    * legacy flat files — the staged write lands in a fresh hidden version
    * dir, never over its own input) as the table's next snapshot.
    * Ownership is re-verified between the slow data write and the instant
    * pointer swap — the merge computation is the part that can outlive the
    * lock TTL; a writer that lost its lease mid-write leaves only an
    * unpublished orphan dir the next vacuum collects. After the swap any
    * legacy flat data files are removed (plain-parquet readers of a
    * migrated table would otherwise silently read the FROZEN pre-migration
    * state forever) and retention is enforced. */
  private def commitVersion(spark: SparkSession, path: String, df: DataFrame,
                            token: String, retainVersions: Int): Unit = {
    import graft.sources.Snapshots
    val v = Snapshots.stageVersion(spark, path, df)
    assertHeld(spark, path, token) // last check before the visible commit
    Snapshots.publish(spark, path, v)
    cleanupFlatFiles(spark, path)
    Snapshots.vacuum(spark, path, keep = math.max(1, retainVersions))
  }

  /** Remove legacy flat data files left at the table root after migration
    * to the versioned layout (crash-safe: runs after every commit, no-op
    * once clean). Hidden `_`-entries (versions, pointer, schema sidecar)
    * survive. */
  private def cleanupFlatFiles(spark: SparkSession, path: String): Unit = {
    val p = new Path(path); val f = fs(spark, p)
    f.listStatus(p).filter { st =>
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }.foreach(st => f.delete(st.getPath, true))
  }

  /** APPEND `df` to the manifested table at `path` — O(new data), the
    * Iceberg fast-append: the staged partitions seal into NEW version
    * slots and each touched partition's manifest state becomes the
    * union of its prior parts and the new one; no existing file is
    * read, rewritten or listed (contrast [[upsert]], which must rewrite
    * touched partitions to honor key semantics). The ingest primitive
    * for log-style facts: a streaming micro-batch's commit cost is its
    * own data + one root delta, however large the partition already is.
    * No key dedup is applied — use `upsert(insertOnly = true)` for
    * MERGE WHEN NOT MATCHED semantics (which routes through this same
    * append commit on manifested tables). With `evolveSchema`, new
    * columns pin the evolved union schema; existing rows read them as
    * NULL. An empty `df` is a no-op.
    *
    * `txn = Some((appId, version))` makes the append IDEMPOTENT per
    * writer (Delta's txnAppId/txnVersion, Iceberg's snapshot summary):
    * the commit stamps `graft.txn.<appId> → version` into the root
    * manifest's props, and — under the same writer lease, so
    * race-free — an append whose version is ≤ the highest already
    * committed for that appId is SKIPPED. The exactly-once handle for
    * streaming redelivery: a foreachBatch retry re-runs with the same
    * batch id and commits nothing twice
    * ([[graft.streaming.Streams.manifestedAppendStream]]). */
  def append(spark: SparkSession, path: String, df: DataFrame,
             partitionCols: Seq[String],
             evolveSchema: Boolean = false,
             lockTtlMs: Long = DefaultLockTtlMs,
             retainVersions: Int = DefaultRetainVersions,
             txn: Option[(String, Long)] = None,
             branch: Option[String] = None): Unit =
    appendImpl(spark, path, df, partitionCols, evolveSchema, lockTtlMs,
      retainVersions, txn, branch, maxWaitMs = 0L)

  /** OPTIMISTIC multi-writer append — [[upsertOptimistic]]'s treatment
    * for the EASIEST concurrency case: fast-append parts COMPOSE (each
    * commit unions its new version part into the partition's state and
    * merges stats monotonically), so two racing appenders both land even
    * on the SAME partition — no conflict validation is needed at all,
    * only a bounded wait for the winner's metadata-speed commit instead
    * of [[append]]'s fail-fast [[ConcurrentWriteException]]. The root
    * chain stays linearizable (each commit folds onto the head it finds
    * under the lease), the changelog nets both appends, and `txn`
    * idempotency holds unchanged — which is what lets a streaming ingest
    * ([[graft.streaming.Streams.manifestedAppendStream]]) run
    * concurrently with batch compaction/MERGE jobs on one table, the
    * standard lakehouse operating mode. Two concurrent ingest jobs on
    * one table both commit where [[append]] would make one fail. */
  def appendOptimistic(spark: SparkSession, path: String, df: DataFrame,
                       partitionCols: Seq[String],
                       evolveSchema: Boolean = false,
                       maxWaitMs: Long = 120000L,
                       lockTtlMs: Long = DefaultLockTtlMs,
                       retainVersions: Int = DefaultRetainVersions,
                       txn: Option[(String, Long)] = None,
                       branch: Option[String] = None): Unit =
    appendImpl(spark, path, df, partitionCols, evolveSchema, lockTtlMs,
      retainVersions, txn, branch, maxWaitMs = maxWaitMs)

  /** Acquire the table lease, waiting up to `maxWaitMs` with bounded
    * backoff. `maxWaitMs <= 0` is LITERALLY fail-fast ([[append]]'s
    * historical contract) — not "one retry if the first failure lands
    * in the deadline's own millisecond". */
  private def acquireLockWaiting(spark: SparkSession, path: String,
                                 ttlMs: Long, maxWaitMs: Long): String = {
    if (maxWaitMs <= 0) return acquireLock(spark, path, ttlMs)
    val deadline = System.currentTimeMillis() + maxWaitMs
    var backoff = 25L
    while (true) {
      try return acquireLock(spark, path, ttlMs)
      catch {
        case e: ConcurrentWriteException =>
          if (System.currentTimeMillis() >= deadline) throw e
          Thread.sleep(backoff); backoff = math.min(backoff * 2, 1000L)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def appendImpl(spark: SparkSession, path: String, df: DataFrame,
                         partitionCols: Seq[String],
                         evolveSchema: Boolean,
                         lockTtlMs: Long,
                         retainVersions: Int,
                         txn: Option[(String, Long)],
                         branch: Option[String],
                         maxWaitMs: Long): Unit = {
    import graft.sources.PartitionSnapshots
    require(partitionCols.nonEmpty, "append: partitionCols required")
    require(branch.isEmpty || PartitionSnapshots.isManifested(spark, path),
      "append: branch commits require an existing manifested table")
    // same guard as the rewrite path: later partition-value rendering
    // (deleteKeys, upsert's touched-partition delete) cannot reproduce
    // the writer's timestamp dir format — never let such a table exist
    df.schema.fields.filter(f => partitionCols.contains(f.name)).foreach { f =>
      require(f.dataType != org.apache.spark.sql.types.TimestampType &&
        f.dataType != org.apache.spark.sql.types.TimestampNTZType,
        s"append: timestamp-typed partition column '${f.name}' is not " +
          "supported (partition by the derived DATE instead)")
    }
    if (df.isEmpty) return
    val token = acquireLockWaiting(spark, path, lockTtlMs, maxWaitMs)
    try {
      recoverSwap(spark, path)
      val alreadyCommitted = txn.exists { case (appId, v) =>
        PartitionSnapshots.lastTxnVersion(spark, path,
          s"graft.txn.$appId", branch).exists(_ >= v)
      }
      if (alreadyCommitted) return
      require(!graft.sources.Snapshots.isVersioned(spark, path),
        s"append: $path is a whole-table snapshot table")
      PartitionSnapshots.ensureManifested(spark, path, partitionCols)
      PartitionSnapshots.cleanupStaging(spark, path)
      // a branch append aligns against the BRANCH head's schema, never
      // main's (mirrors upsertLocked's branch-merge read): a branch that
      // evolved its schema beyond main must not have later appends
      // rejected against — or silently re-pinned to — main's columns
      val branchHead: Option[Long] = branch.map(n =>
        PartitionSnapshots.rootBranches(spark, path).getOrElse(n,
          throw new IllegalArgumentException(
            s"append: no branch '$n' at $path — createBranch first")))
      // hidden-partitioning: derive transform dir columns before the
      // drift check — the raw table side carries them, callers never do
      val dfT = PartitionSnapshots.applyTransforms(spark, path, df)
      // The drift check needs only the table's COLUMN SET — derive it
      // from pinned metadata, never by constructing the table frame:
      // construction lists every live data dir, so an append-heavy
      // table (a streaming ingest between compactions) would pay
      // O(accumulated parts) PER micro-batch — measured O(n²) across a
      // commit-chain drill before this. The pinned union schema + spec
      // columns is exactly the shape readEntries serves; only pre-
      // schema-pinning tables fall back to the real frame.
      lazy val existing: Option[DataFrame] = branchHead match {
        case Some(v) => PartitionSnapshots.readRawOption(spark, path,
          asOf = v)
        case None => readTable(spark, path)
      }
      val tableSchema: Option[org.apache.spark.sql.types.StructType] =
        PartitionSnapshots.mergeReadSchema(spark, path, branchHead,
            dfT.schema, partitionCols)
          .orElse(existing.map(_.schema))
      val out = tableSchema match {
        case Some(ts) if evolveSchema =>
          // align() uses the target side only for its SCHEMA — an empty
          // schema-typed frame serves without listing a single file
          align(spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], ts),
            dfT)._2
        case Some(ts) =>
          require(ts.fieldNames.sorted.sameElements(dfT.columns.sorted),
            s"append: schema drift at $path (pass evolveSchema = true): " +
              s"table ${ts.fieldNames.sorted.toSeq} vs " +
              s"df ${dfT.columns.sorted.toSeq}")
          dfT
        case None => dfT
      }
      val staging = s"$path/_staging-${java.util.UUID.randomUUID()}"
      packedWriter(spark, out, partitionCols, SaveMode.ErrorIfExists)
        .partitionBy(partitionCols: _*).parquet(staging)
      try {
        assertHeld(spark, path, token)
        // `out` is already conformed to the union schema when evolving
        PartitionSnapshots.commitAppendStaged(spark, path, staging,
          partitionCols, retainVersions, Some(out.schema),
          txn.map { case (appId, v) =>
            Map(s"graft.txn.$appId" -> v.toString)
          }.getOrElse(Map.empty), branch)
      } finally fs(spark, new Path(staging)).delete(new Path(staging), true)
    } finally releaseLock(spark, path, token)
  }

  /** Full REPLACE of the table at `path` with `df` (whose plan may read
    * the current table — the new state is staged as the next snapshot
    * before the pointer moves), under the same single-writer lease and
    * crash recovery as [[upsert]]. The primitive a CDC snapshot maintainer
    * needs: merge semantics live in the caller's plan, durability
    * semantics live here. */
  def replace(spark: SparkSession, path: String, df: DataFrame,
              lockTtlMs: Long = DefaultLockTtlMs,
              retainVersions: Int = DefaultRetainVersions): Unit = {
    val token = acquireLock(spark, path, lockTtlMs)
    try {
      recoverSwap(spark, path)
      // same guard as the whole-table upsert leg: commitVersion's
      // cleanupFlatFiles would delete a manifested table's partition dirs
      require(!graft.sources.PartitionSnapshots.isManifested(spark, path),
        s"replace: $path carries partition manifests; route the rewrite " +
          "through upsert(partitionCols = ...) instead")
      commitVersion(spark, path, df, token, retainVersions)
    } finally releaseLock(spark, path, token)
  }

  /** Recover from a crash between the two swap renames: if the table dir
    * is gone but `path__old` survives, restore it. Called before every
    * upsert; a fully-committed table is untouched. */
  private def recoverSwap(spark: SparkSession, path: String): Unit = {
    val p = new Path(path); val f = fs(spark, p)
    val old = new Path(path + "__old")
    if (!f.exists(p) && f.exists(old) && !f.rename(old, p))
      throw new IllegalStateException(s"upsert recovery: rename $old -> $p failed")
  }

  /** Materialize a plan that reads `path` somewhere that isn't `path`. */
  private def stage(spark: SparkSession, path: String, df: DataFrame): String = {
    val tmp = path + "__stage"
    df.write.mode(SaveMode.Overwrite).parquet(tmp)
    tmp
  }
}
