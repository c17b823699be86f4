package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.sources.PartitionSnapshots

/** Streaming CHANGE FEED over a manifested table (Delta's CDF stream /
  * Iceberg's incremental changelog read, as a Structured Streaming
  * source): `spark.readStream.format("graft-changelog").option("path",
  * table).load()` yields one row per changed row per commit, shaped as
  * the table's columns + `change_type` ('insert' | 'delete'; an update
  * is its pair) + `_commit_version` (the root version that carried it).
  *
  * OFFSETS ARE ROOT VERSIONS: the checkpoint pins exactly which commits
  * a restart has already served, so the feed is exactly-once end-to-end
  * when the sink is idempotent per batch (e.g.
  * [[Streams.manifestedAppendStream]] downstream — the two compose into
  * a transactional table-to-table pipeline). Each micro-batch diffs
  * manifests first ([[graft.sources.PartitionSnapshots.changes]]) —
  * partitions pinned at the same state on both sides are never read, so
  * a batch costs O(partitions the commits touched), never O(table).
  *
  * Semantics and bounds, all inherited from the batch changelog:
  *  - per-commit granularity: a batch spanning several commits unions
  *    one feed per commit, each stamped with its `_commit_version`
  *    (never the net effect across them);
  *  - `startingVersion = v` replays history from commit v (v = 1 with a
  *    vacuumed head replays the oldest retained state as inserts);
  *    absent, the stream starts at the CURRENT version and serves only
  *    commits after stream creation (Delta's default);
  *  - the root retention window must cover consumer lag: a stream
  *    resuming onto a vacuumed `fromV` fails LOUDLY (the expire-
  *    snapshots contract — same rule as pinned batch readers);
  *  - schema is pinned at stream creation; additive column evolution
  *    mid-stream keeps serving the pinned columns (new columns appear
  *    on restart). A dropped/renamed column fails the batch loudly.
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
                            parameters: Map[String, String]): Source =
    new ChangelogSource(sqlContext.sparkSession, table(parameters),
      parameters.get("startingVersion").map(_.toLong))
}

object ChangelogSource {
  /** The feed's fixed shape: the table read's columns + change metadata.
    * Derived from an empty same-version diff so every fallback (pinned
    * schema, FLAT migration footer inference) matches the batch
    * changelog exactly. */
  def feedSchema(spark: SparkSession, table: String): StructType = {
    require(PartitionSnapshots.isManifested(spark, table),
      s"graft-changelog: $table is not a manifested table")
    val cur = PartitionSnapshots.rootVersions(spark, table).lastOption
      .getOrElse(throw new IllegalArgumentException(
        s"graft-changelog: $table has no committed root version"))
    PartitionSnapshots.changes(spark, table, cur, cur).schema
      .add("_commit_version", LongType, nullable = false)
  }
}

class ChangelogSource(spark: SparkSession, table: String,
                      startingVersion: Option[Long]) extends Source {
  private val declared = ChangelogSource.feedSchema(spark, table)
  // last version already OUTSIDE the feed (exclusive lower bound) when
  // the checkpoint has no offset yet: startingVersion - 1, or — the
  // "only new commits" default — the current version at source creation
  private val initialBase: Long = startingVersion.map { v =>
    require(v >= 1, s"startingVersion must be >= 1, got $v")
    v - 1
  }.getOrElse(PartitionSnapshots.rootVersions(spark, table).lastOption
    .getOrElse(0L))

  override def schema: StructType = declared

  override def getOffset: Option[V1Offset] = {
    val cur = PartitionSnapshots.rootVersions(spark, table).lastOption
      .getOrElse(0L)
    if (cur == 0L) None else Some(LongOffset(math.max(cur, initialBase)))
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val fromV = start.map(_.json.trim.toLong).getOrElse(initialBase)
    val toV = end.json.trim.toLong
    val commits = PartitionSnapshots.rootVersions(spark, table)
      .filter(v => v > fromV && v <= toV)
    val feed =
      if (commits.isEmpty)
        PartitionSnapshots.changes(spark, table, toV, toV)
          .withColumn("_commit_version", lit(0L)).limit(0)
      else commits.foldLeft((fromV, Option.empty[DataFrame])) {
        case ((prev, acc), v) =>
          val one = PartitionSnapshots.changes(spark, table, prev, v)
            .withColumn("_commit_version", lit(v))
          (v, Some(acc.fold(one)(_ unionByName one)))
      }._2.get
    // pin the stream-creation shape: additive evolution's new columns
    // are dropped until restart; anything else fails loudly here
    val shaped = feed.select(declared.fieldNames.map(col).toSeq: _*)
    org.apache.spark.sql.graft.SqlInternals.internalCreateStreamingDataFrame(
      spark, shaped.queryExecution.toRdd, declared)
  }

  override def commit(end: V1Offset): Unit = ()
  override def stop(): Unit = ()
}
