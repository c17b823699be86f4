package org.apache.spark.sql.graft

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, InMemoryFileIndex, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

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
                   rowsHint: Option[Long]): DataFrame = {
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
    // 8 bytes of overhead + each column's type default size)
    val bytesHint = rowsHint.map(_ *
      (8L + fullSchema.fields.map(_.dataType.defaultSize.toLong).sum))
    val index = new DeferredFileIndex(session, paths.map(new Path(_)),
      options, fullSchema, partitionSchemaN, bytesHint)
    val relation = HadoopFsRelation(index, partitionSchemaN, dataSchemaN,
      None, new ParquetFileFormat, options)(session)
    Dataset.ofRows(session, LogicalRelation(relation, isStreaming = false))
  }
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

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression])
      : Seq[PartitionDirectory] =
    delegate.listFiles(partitionFilters, dataFilters)

  override def inputFiles: Array[String] = delegate.inputFiles

  override def refresh(): Unit = delegate.refresh()

  /** Join-sizing estimate. The hint is manifest row count × Spark's
    * default row width — an upper bound for states with pending
    * deletes (safe: never under-sizes a broadcast candidate). */
  override def sizeInBytes: Long = bytesHint.getOrElse(delegate.sizeInBytes)
}
