package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StructType}

import graft.sources.PartitionSnapshots

/** Streaming CHANGE FEED over a manifested table (Delta's CDF stream /
  * Iceberg's incremental changelog read, as a Structured Streaming
  * source): `spark.readStream.format("graft-changelog").option("path",
  * table).load()` yields one row per changed row per commit, shaped as
  * the table's columns + `change_type` ('insert' | 'delete'; an update
  * is its pair) + `_commit_version` (the root version that carried it).
  *
  * OFFSETS ARE MAIN-PUBLISHED ROOT VERSIONS — the live pointer, not the
  * newest slot — so BRANCH-staged commits never leak into the feed: a
  * branch's slots carry a line stamp and are skipped, and a
  * fast-forward surfaces the published branch state as one net diff
  * stamped with the head's version. The stream's starting point is
  * persisted in the checkpoint's source metadata dir on first start, so
  * a crash-replay of micro-batch 0 re-reads exactly the window the
  * offset log recorded. Exactly-once end-to-end when the sink is
  * idempotent per batch (e.g. [[Streams.manifestedAppendStream]] — the
  * two compose into a transactional table-to-table pipeline). Each
  * micro-batch diffs manifests first
  * ([[graft.sources.PartitionSnapshots.changes]]) — partitions pinned at
  * the same state on both sides are never read, so a batch costs
  * O(partitions the commits touched), never O(table).
  *
  * Semantics and bounds, all inherited from the batch changelog:
  *  - per-commit granularity along the MAIN line: a batch spanning
  *    several main commits unions one feed per commit, each stamped
  *    with its `_commit_version`; branch-staged versions in between
  *    fold into the next main pair's diff (they were never published);
  *  - `startingVersion = v` replays history from commit v (v = 1 with a
  *    vacuumed head replays the oldest retained state as inserts);
  *    absent, the stream starts at the CURRENT version and serves only
  *    commits after stream creation (Delta's default);
  *  - the root retention window must cover consumer lag: a stream
  *    resuming onto a vacuumed `fromV` fails LOUDLY (the expire-
  *    snapshots contract — same rule as pinned batch readers);
  *  - after a [[graft.sources.PartitionSnapshots.rollbackRoot]] the
  *    pointer sits below the consumed offset: the feed pauses until the
  *    pointer passes it again, then emits the net diff across the fork;
  *  - schema is pinned at stream creation; additive column evolution
  *    mid-stream keeps serving the pinned columns (new columns appear
  *    on restart), and a `startingVersion` replay ACROSS an evolution
  *    commit NULL-fills the added columns for pre-evolution commits —
  *    every per-commit feed is conformed to the declared shape before
  *    combining, so replay and evolution compose.
  */
class ChangelogSourceProvider extends StreamSourceProvider
    with DataSourceRegister {
  override def shortName(): String = "graft-changelog"

  private def table(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-changelog: .option(\"path\", <manifested table dir>) required"))

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String])
      : (String, StructType) = {
    require(schema.isEmpty,
      "graft-changelog: schema is derived from the table's pinned schema")
    (shortName(),
      ChangelogSource.feedSchema(sqlContext.sparkSession, table(parameters)))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val mode = parameters.getOrElse("startingMode", "latest")
    require(mode == "latest" || mode == "initial-snapshot",
      s"graft-changelog: startingMode must be 'latest' or " +
        s"'initial-snapshot', got '$mode'")
    new ChangelogSource(sqlContext.sparkSession, table(parameters),
      parameters.get("startingVersion").map(_.toLong), metadataPath,
      parameters.get("branch"), initialSnapshot = mode == "initial-snapshot")
  }
}

object ChangelogSource {
  /** The feed's fixed shape: the table read's columns + change metadata.
    * Derived from an empty same-version diff so every fallback (pinned
    * schema, FLAT migration footer inference) matches the batch
    * changelog exactly. */
  def feedSchema(spark: SparkSession, table: String): StructType = {
    require(PartitionSnapshots.isManifested(spark, table),
      s"graft-changelog: $table is not a manifested table")
    val cur = PartitionSnapshots.currentRootVersion(spark, table)
      .getOrElse(throw new IllegalArgumentException(
        s"graft-changelog: $table has no committed root version"))
    PartitionSnapshots.changes(spark, table, cur, cur).schema
      .add("_commit_version", LongType, nullable = false)
  }
}

class ChangelogSource(spark: SparkSession, table: String,
                      startingVersion: Option[Long],
                      metadataPath: String,
                      branchName: Option[String] = None,
                      initialSnapshot: Boolean = false) extends Source {
  require(!(initialSnapshot && startingVersion.isDefined),
    "graft-changelog: startingMode = 'initial-snapshot' and " +
      "startingVersion are mutually exclusive — the image IS the start")
  private val declared = ChangelogSource.feedSchema(spark, table)

  /** The ref this stream follows: the MAIN pointer by default, or a
    * branch's head with `.option("branch", name)` — an incremental
    * validation consumer of a staged line sees each branch commit as
    * its own micro-batch while main consumers see nothing until the
    * fast-forward. A dropped branch stops the feed loudly on the next
    * trigger. */
  private def refHead(): Option[Long] = branchName match {
    // branchRef (not rootBranches) — it absorbs the ref-swap window a
    // poll can land in while this very branch commits
    case Some(n) => Some(PartitionSnapshots.branchRef(spark, table, n)
      .getOrElse(throw new IllegalArgumentException(
        s"graft-changelog: no branch '$n' at $table"))._1)
    case None => PartitionSnapshots.currentRootVersion(spark, table)
  }

  /** Last version already OUTSIDE the feed (exclusive lower bound) for
    * micro-batch 0 — PERSISTED into the checkpoint's source-metadata
    * dir on first start, because `getBatch(start = None, …)` is re-run
    * on crash-replay and must re-read the exact window the offset log
    * recorded, not whatever the table's head happens to be after the
    * restart (the FileStreamSource/Kafka initial-offset discipline).
    *
    * The floor is stored as VERSIONED marker files `<prefix>-<v>`
    * (value in the name; create is atomic, no rename window) and read
    * as the max over them — a crash at any point leaves either the old
    * floor, the new floor, or both, never none, so the monotonic floor
    * can never be lost to a delete-then-rename gap. Older markers and
    * the legacy single content-bearing file are pruned best-effort
    * after each advance. */
  private val BasePrefix = "graft-changelog-base"
  private val baseDir = new Path(metadataPath)
  private val legacyBaseFile = new Path(baseDir, BasePrefix)
  private lazy val baseFs =
    baseDir.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readBase(): Option[Long] = {
    if (!baseFs.exists(baseDir)) return None
    val vs = baseFs.listStatus(baseDir).toSeq.map(_.getPath.getName).flatMap {
      case BasePrefix => // legacy layout: the value is the file CONTENT
        val in = baseFs.open(legacyBaseFile)
        try Some(new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
        finally in.close()
      case n if n.startsWith(BasePrefix + "-") =>
        n.stripPrefix(BasePrefix + "-").toLongOption
      case _ => None
    }
    if (vs.isEmpty) None else Some(vs.max)
  }

  private def writeBase(v: Long): Unit = {
    baseFs.mkdirs(baseDir)
    baseFs.create(new Path(baseDir, s"$BasePrefix-$v"), true).close()
    // prune superseded markers (best-effort; readBase takes the max, so
    // a crash mid-prune only leaves redundant files, never a regression)
    baseFs.listStatus(baseDir).foreach { st =>
      val n = st.getPath.getName
      val stale = n == BasePrefix ||
        (n.startsWith(BasePrefix + "-") &&
          n.stripPrefix(BasePrefix + "-").toLongOption.exists(_ < v))
      if (stale) baseFs.delete(st.getPath, false)
    }
  }

  /** The base marker as it stood BEFORE this source instance wrote one
    * — Some = an ESTABLISHED checkpoint (offsets may already be planned
    * or committed against it), None = fresh. The bootstrap decision
    * below needs this distinction, so capture it before [[initialBase]]
    * creates the marker. */
  private val preexistingBase: Option[Long] = readBase()

  private val initialBase: Long = preexistingBase.getOrElse {
    val v = startingVersion.map { sv =>
      require(sv >= 1, s"startingVersion must be >= 1, got $sv")
      sv - 1
    }.getOrElse(refHead().getOrElse(0L))
    writeBase(v)
    readBase().getOrElse(v) // a concurrent (re)creator can only raise it
  }

  /** INITIAL-SNAPSHOT BOOTSTRAP (Delta's `readStream.format("delta")`
    * default / Iceberg's incremental read from a snapshot): a FRESH
    * consumer on a chain whose early roots retention already expired
    * cannot replay full history (`startingVersion = 1` refuses loudly —
    * the expire-snapshots contract), but it CAN start from the current
    * snapshot image: batch 0 serves every live row as
    * `change_type = 'insert'` stamped with the bootstrap version, then
    * the stream tails ordinary per-commit diffs above it. The marker is
    * persisted beside the base floor so a crash-replay of micro-batch 0
    * re-serves the exact same image (the read pins `asOf` the recorded
    * version); it is consulted on every start, so a restart keeps the
    * semantics even if the option is dropped from the restarted query. */
  private val BootstrapPrefix = "graft-changelog-bootstrap"
  private def readBootstrap(): Option[Long] = {
    if (!baseFs.exists(baseDir)) return None
    val vs = baseFs.listStatus(baseDir).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith(BootstrapPrefix + "-") =>
        n.stripPrefix(BootstrapPrefix + "-").toLongOption
      }.flatten
    if (vs.isEmpty) None else Some(vs.max)
  }
  private val bootstrapAt: Option[Long] = readBootstrap().orElse {
    // the marker may be created only on a FRESH checkpoint: writing one
    // at an ESTABLISHED checkpoint's persisted base would change what a
    // crash-replay of its uncommitted batch 0 serves (the replay would
    // suddenly carry a full-table image the original batch never
    // contained) — refuse loudly instead of silently rewriting history
    require(!initialSnapshot || preexistingBase.isEmpty,
      "changelog: startingMode=initial-snapshot was requested against an " +
        "established checkpoint that has no bootstrap marker — the option " +
        "only applies to a NEW query; drop it to keep tailing, or start a " +
        "fresh checkpoint to bootstrap from the current snapshot")
    if (initialSnapshot && initialBase > 0) {
      baseFs.mkdirs(baseDir)
      baseFs.create(new Path(baseDir, s"$BootstrapPrefix-$initialBase"),
        true).close()
      Some(initialBase)
    } else None
  }

  override def schema: StructType = declared

  /** Highest offset this source has served or seen committed — the
    * floor that keeps offsets MONOTONIC when the table's pointer moves
    * backwards (rollbackRoot): the feed pauses until the pointer passes
    * the consumed offset again, then emits the net diff across the
    * fork (lineage selection below skips the abandoned commits).
    * Persisted monotonically into the base file at each [[commit]] so a
    * RESTART during the rollback window cannot regress below the
    * consumed offset and re-serve the abandoned commits. */
  @volatile private var servedFloor = initialBase

  override def getOffset: Option[V1Offset] = {
    // the followed REF's head (main pointer by default — never the
    // newest slot: branch-staged versions above it are not published
    // and must not become main offsets)
    val cur = refHead().getOrElse(0L)
    if (cur == 0L) None
    else Some(LongOffset(math.max(math.max(cur, initialBase), servedFloor)))
  }

  /** Root versions on `toV`'s RECORDED-PARENT lineage strictly above
    * `above`, ascending. Walking the lineage (not the version range)
    * is what keeps commits a rollback abandoned or a dropped branch
    * staged from ever re-entering the feed; a break in the chain (a
    * pre-upgrade full manifest with no recorded parent) just coarsens
    * the first pair into a net diff. */
  private def lineage(toV: Long, above: Long): List[Long] = {
    var acc = List.empty[Long]
    var v: Option[Long] = Some(toV)
    while (v.exists(_ > above)) {
      acc = v.get :: acc
      v = PartitionSnapshots.parentOfRoot(spark, table, v.get)
    }
    acc
  }

  /** The micro-batch's feed as an ORDINARY batch DataFrame (getBatch
    * wraps it with the isStreaming flag the engine asserts on). */
  private[graft] def batchFeed(start: Option[Long], toV: Long): DataFrame = {
    val fromV = start.getOrElse(initialBase)
    servedFloor = math.max(servedFloor, math.max(fromV, toV))
    // per-commit granularity along toV's LINEAGE restricted to the MAIN
    // line; toV itself is always included (it was an offset, i.e.
    // pointer-published — after a fast-forward that is the branch head,
    // serving the published state as one net diff). Branch-staged
    // versions and rollback-abandoned commits are not on the lineage /
    // not main-stamped and fold into the next included pair's diff.
    // which lineage commits belong to THIS feed: main consumers see
    // main-line commits; a branch consumer additionally sees its own
    // branch's commits (its lineage walks through them to the fork) —
    // never another branch's
    def onLine(v: Long): Boolean =
      PartitionSnapshots.isMainLine(spark, table, v) ||
        branchName.exists(n => PartitionSnapshots.rootProps(spark, table, v)
          .get(PartitionSnapshots.LineProp).contains(s"branch:$n"))
    val commits =
      if (toV <= fromV) Nil
      else lineage(toV, fromV).filter(v => v == toV || onLine(v))
    // conform each per-commit feed to the STREAM's declared shape:
    // changes() reads every pair at that commit's own pinned schema, so
    // a feed for a pre-evolution commit lacks columns added later — a
    // startingVersion replay across an additive evolution commit must
    // NULL-fill them (the rows predate the column), and a feed for a
    // post-evolution commit read by a pre-evolution stream drops the
    // new columns until restart (the documented pin). Without this the
    // final select throws on the missing column and the checkpoint is
    // permanently poisoned (restart replays the same window).
    // ... and RENAME/WIDEN-aware through the current pinned alias graph:
    // a replay across a rename serves pre-rename commits whose feed
    // carries the OLD name (that era's own schema) — resolve a declared
    // name through its field's aliases before null-filling; a stream
    // declared before a rename likewise finds its old name's values
    // under the field's NEW name. The cast serves widened replays
    // (pre-widen feeds arrive narrow).
    def conform(df: DataFrame): DataFrame = {
      val have = df.columns.toSet
      lazy val pinnedFields = PartitionSnapshots
        .currentRootVersion(spark, table)
        .flatMap(v => PartitionSnapshots.pinnedSchema(spark, table, v))
        .map(_.fields.toSeq).getOrElse(Nil)
      def resolve(name: String): Option[String] =
        if (have.contains(name)) Some(name)
        else pinnedFields.find(f => f.name == name ||
            PartitionSnapshots.fieldAliases(f).contains(name))
          .flatMap(f => (f.name +: PartitionSnapshots.fieldAliases(f))
            .find(have.contains))
      // cast ONLY same-type or WIDENING (pre-widen int feeds into a
      // long-declared stream): a stream declared before a widenColumn
      // must NOT silently wrap post-widen long values into its narrow
      // int — leave the column uncast so the mismatch surfaces loudly
      // (restart the stream to pick up the widened schema)
      def widens(from: org.apache.spark.sql.types.DataType,
                 to: org.apache.spark.sql.types.DataType): Boolean = {
        import org.apache.spark.sql.types._
        (from, to) match {
          case (a, b) if a == b => true
          case (ByteType, ShortType | IntegerType | LongType | DoubleType) => true
          case (ShortType, IntegerType | LongType | DoubleType) => true
          case (IntegerType, LongType | DoubleType) => true
          case (FloatType, DoubleType) => true
          case _ => false
        }
      }
      df.select(declared.fields.toSeq.filter(_.name != "_commit_version")
        .map { f =>
          resolve(f.name) match {
            case Some(c) if widens(df.schema(c).dataType, f.dataType) =>
              col(c).cast(f.dataType).as(f.name)
            case Some(c) => col(c).as(f.name)
            case None => lit(null).cast(f.dataType).as(f.name)
          }
        }: _*)
    }
    val feed =
      if (commits.isEmpty)
        conform(PartitionSnapshots.changes(spark, table, toV, toV))
          .withColumn("_commit_version", lit(0L)).limit(0)
      else commits.foldLeft((fromV, Option.empty[DataFrame])) {
        case ((prev, acc), v) =>
          val one = conform(PartitionSnapshots.changes(spark, table, prev, v))
            .withColumn("_commit_version", lit(v))
          (v, Some(acc.fold(one)(_ unionByName one)))
      }._2.get
    // micro-batch 0 of an initial-snapshot stream leads with the table
    // image at the bootstrap version, every live row an 'insert' (the
    // pinned asOf read makes a crash-replay byte-identical); later
    // batches (start defined) never re-serve it
    val withImage = (if (start.isEmpty) bootstrapAt else None) match {
      case Some(bv) =>
        // readOption: a table that is EMPTY at the bootstrap version
        // (e.g. just truncated) bootstraps with a zero-row image
        val image = PartitionSnapshots.readOption(spark, table, asOf = bv)
          .map(img => conform(img.withColumn("change_type", lit("insert")))
            .withColumn("_commit_version", lit(bv)))
        image.fold(feed)(_ unionByName feed)
      case None => feed
    }
    withImage.select(declared.fieldNames.map(col).toSeq: _*)
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val shaped = batchFeed(start.map(_.json.trim.toLong),
      end.json.trim.toLong)
    org.apache.spark.sql.graft.SqlInternals.internalCreateStreamingDataFrame(
      spark, shaped.queryExecution.toRdd, declared)
  }

  override def commit(end: V1Offset): Unit = {
    val v = end.json.trim.toLong
    if (v > servedFloor) {
      servedFloor = v
      writeBase(v) // monotonic: survives a restart mid-rollback-window
    }
  }
  override def stop(): Unit = ()
}
