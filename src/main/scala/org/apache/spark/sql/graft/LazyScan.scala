package org.apache.spark.sql.graft

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BoundReference, Cast, EvalMode, Expression, Literal, Predicate}
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, InMemoryFileIndex, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Parquet scan whose file LISTING is deferred until the first action —
  * the construction-cost fix for manifested-table reads. A plain
  * `spark.read.parquet(dirs…)` builds an [[InMemoryFileIndex]] whose
  * constructor eagerly lists every leaf file (measured ~7–10 s at the
  * 65k-file decade), even when the returned frame is never executed —
  * which is exactly the shape of a routed SQL statement's response
  * frame. Here the schema comes from the caller (the table's pinned
  * metadata), the partition columns and their types come from the
  * manifest's rel paths, and optional size/row hints come from the
  * manifest stats, so DataFrame construction + analysis touch ZERO data
  * files; the [[InMemoryFileIndex]] is built lazily inside
  * [[DeferredFileIndex]] on the first planner/executor call that
  * genuinely needs files.
  *
  * The relation itself is the ordinary `HadoopFsRelation` + parquet
  * `FileFormat` — pushdown, column pruning, `_metadata` row identity,
  * and whole-stage codegen are byte-identical to the eager read. */
object LazyScan {

  /** Frame over parquet `paths` (all sharing one partition-dir layout)
    * with deferred listing. `dataSchema` excludes partition columns;
    * `partitionSchema` is ordered exactly as the dir segments nest.
    * `rowsHint` (from manifest stats; exact for delete-free states)
    * feeds the planner's size estimate so join-strategy decisions are
    * right-sized WITHOUT listing — absent, the size estimate falls back
    * to the delegate's (listing lazily at first ask). */
  def parquetFrame(spark: org.apache.spark.sql.SparkSession,
                   paths: Seq[String],
                   options: Map[String, String],
                   dataSchema: StructType,
                   partitionSchema: StructType,
                   rowsHint: Option[Long],
                   bytesFloor: Option[Long] = None): DataFrame = {
    val session = spark.asInstanceOf[ClassicSession]
    // nullable-relaxed like DataSource.resolveRelation's own
    // dataSchema.asNullable: a file CAN hold nulls whatever the writer's
    // frame declared, and a non-nullable read schema would silently
    // materialize them as zero values
    val dataSchemaN = dataSchema.asNullable
    val partitionSchemaN = partitionSchema.asNullable
    val fullSchema = StructType(dataSchemaN.fields ++
      partitionSchemaN.fields.filterNot(f =>
        dataSchemaN.fieldNames.contains(f.name)))
    // the planner's in-memory row width (Spark's own per-row estimate:
    // 8 bytes of overhead + each column's type default size), FLOORED
    // by the manifest's recorded on-disk bytes when known: default
    // widths count a string as 20 bytes, so a wide-string table could
    // otherwise estimate UNDER autoBroadcastJoinThreshold and broadcast
    // itself into a driver OOM — the recorded file bytes are exactly
    // what the eager path's listing-based estimate would have served,
    // so the hint never sits below it
    val bytesHint = rowsHint.map(_ *
      (8L + fullSchema.fields.map(_.dataType.defaultSize.toLong).sum))
      .map(est => math.max(est, bytesFloor.getOrElse(0L)))
    val index = new DeferredFileIndex(session, paths.map(new Path(_)),
      options, fullSchema, partitionSchemaN, bytesHint)
    val relation = HadoopFsRelation(index, partitionSchemaN, dataSchemaN,
      None, new ParquetFileFormat, options)(session)
    Dataset.ofRows(session, LogicalRelation(relation, isStreaming = false))
  }

  /** Test/diagnostic: how many root dirs the frame's deferred index
    * listed on its most recent scan (None when the plan holds no
    * deferred index — e.g. an eager-path read). */
  def lastListedRootCount(df: DataFrame): Option[Int] =
    df.queryExecution.analyzed.collect {
      case l: LogicalRelation => l.relation
    }.collectFirst {
      case h: HadoopFsRelation if h.location.isInstanceOf[DeferredFileIndex] =>
        h.location.asInstanceOf[DeferredFileIndex].lastListedRootCount
    }.filter(_ >= 0)
}

/** [[FileIndex]] that defers to an [[InMemoryFileIndex]] built on first
  * use: `partitionSchema` and (when manifest stats provide it)
  * `sizeInBytes` answer from metadata alone; everything that truly
  * needs files forces the one-time listing. */
private[graft] class DeferredFileIndex(
    session: ClassicSession,
    roots: Seq[Path],
    options: Map[String, String],
    fullSchema: StructType,
    override val partitionSchema: StructType,
    bytesHint: Option[Long]) extends FileIndex {

  @transient private lazy val delegate = {
    // the eager reader failed LOUDLY on a vanished dir (retention
    // expiring a pinned state) via DataSource's path check; Spark's
    // listing itself swallows FileNotFound into an empty result, which
    // would silently serve a partial table — keep the loud contract
    val fs = roots.head.getFileSystem(session.sparkContext.hadoopConfiguration)
    val missing = roots.filterNot(fs.exists)
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"read: ${missing.size} pinned data dir(s) no longer exist " +
          s"(retention expired this snapshot?): ${missing.take(3).mkString(", ")}")
    new InMemoryFileIndex(session, roots, options, Some(fullSchema))
  }

  override def rootPaths: Seq[Path] = roots

  /** PARTITION-PRUNED LISTING (the manifest-pruning Iceberg does before
    * touching the object store): each root path IS one partition dir,
    * and its partition values are right there in the `k=v` segments —
    * so partition filters are evaluated against the paths FIRST, and
    * only the surviving dirs are ever listed. A point-partition query
    * on a 100k-dir table lists one directory, not 100k. Anything
    * unparseable or unbindable falls back to the full listing
    * (conservative: Spark re-applies the same filters after listing,
    * so pruning here can never change results, only skip IO). */
  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression])
      : Seq[PartitionDirectory] = {
    val idx =
      if (partitionFilters.isEmpty || partitionSchema.isEmpty) delegate
      else prunedRoots(partitionFilters) match {
        case Some(keep) if keep.size < roots.size => prunedIndex(keep)
        case _ => delegate
      }
    lastListedRootCount = idx.rootPaths.size
    idx.listFiles(partitionFilters, dataFilters)
  }

  /** Test/diagnostic hook: how many root dirs the last [[listFiles]]
    * actually listed. */
  @volatile private[graft] var lastListedRootCount: Int = -1

  /** Partition values of one root dir, parsed from its `k=v` path
    * segments in [[partitionSchema]] order; None when any segment is
    * missing or fails to cast (→ no pruning, full listing). */
  private def partitionRowOf(p: Path): Option[InternalRow] = {
    val segs = p.toUri.getPath.split("/")
    val vals = partitionSchema.fields.map { f =>
      segs.reverseIterator.find(_.startsWith(f.name + "=")) match {
        case None => return None
        case Some(seg) =>
          val raw = ExternalCatalogUtils.unescapePathName(
            seg.substring(f.name.length + 1))
          if (raw == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) null
          else try Cast(Literal(UTF8String.fromString(raw), StringType),
            f.dataType, Some(session.sessionState.conf.sessionLocalTimeZone),
            EvalMode.ANSI).eval(null)
          catch { case _: Exception => return None }
      }
    }
    Some(InternalRow.fromSeq(vals.toIndexedSeq))
  }

  /** Roots whose dir-derived partition row satisfies every filter; None
    * when the filters can't be bound to the partition schema by name. */
  private def prunedRoots(filters: Seq[Expression]): Option[Seq[Path]] =
    try {
      val bound = filters.map(_.transform {
        case a: AttributeReference =>
          val i = partitionSchema.fieldIndex(a.name)
          BoundReference(i, partitionSchema(i).dataType, nullable = true)
      })
      if (bound.exists(e => e.exists(_.isInstanceOf[AttributeReference])))
        return None // a filter referenced something beyond the pcols
      val pred = Predicate.createInterpreted(
        bound.reduce(org.apache.spark.sql.catalyst.expressions.And(_, _)))
      pred.initialize(0)
      val rows = roots.map(r => r -> partitionRowOf(r))
      if (rows.exists(_._2.isEmpty)) None
      else Some(rows.collect { case (r, Some(row)) if pred.eval(row) => r })
    } catch { case _: Exception => None }

  /** Listing over a SUBSET of the roots — memoized per subset so a
    * re-planned query (AQE re-optimization) never re-lists. The missing-
    * dir loudness check applies to the subset only: dirs the filter
    * excluded are never touched, so retention expiring an UNREAD
    * partition under a pinned frame cannot fail a pruned query. */
  @transient private lazy val subIndexes =
    new java.util.concurrent.ConcurrentHashMap[Seq[Path], InMemoryFileIndex]()
  private def prunedIndex(keep: Seq[Path]): InMemoryFileIndex = {
    // bounded memo: a long-lived frame probed with many distinct point
    // filters must not accumulate indexes (the shared FileStatusCache
    // still dedupes the underlying dir listings after a clear)
    if (subIndexes.size() > 64) subIndexes.clear()
    subIndexes.computeIfAbsent(keep, { ks =>
      val fs = roots.head.getFileSystem(
        session.sparkContext.hadoopConfiguration)
      val missing = ks.filterNot(fs.exists)
      if (missing.nonEmpty)
        throw new IllegalArgumentException(
          s"read: ${missing.size} pinned data dir(s) no longer exist " +
            s"(retention expired this snapshot?): " +
            missing.take(3).mkString(", "))
      new InMemoryFileIndex(session, ks, options, Some(fullSchema))
    })
  }

  override def inputFiles: Array[String] = delegate.inputFiles

  override def refresh(): Unit = delegate.refresh()

  /** Join-sizing estimate. The hint is manifest row count × Spark's
    * default row width — an upper bound for states with pending
    * deletes (safe: never under-sizes a broadcast candidate). */
  override def sizeInBytes: Long = bytesHint.getOrElse(delegate.sizeInBytes)
}
