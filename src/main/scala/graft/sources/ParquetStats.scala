package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Parquet FOOTER statistics for a directory of data files — row counts
  * and per-column min/max read from the metadata Spark's own writer
  * already recorded, with ZERO extra Spark jobs (the same harvest an
  * Iceberg writer performs to fill its manifest `lower_bounds`/
  * `upper_bounds`/`record_count` fields). Cost is O(files) footer reads
  * of the TOUCHED partitions only, done once at commit time; readers
  * then plan scans from the manifest without opening any footer.
  *
  * Captured columns are top-level primitives with comparable, portably
  * stringifiable stats (int32/int64/float/double + UTF-8 binary);
  * nested fields, decimals, int96 and friends are skipped — an absent
  * stat means "cannot prune", never a wrong answer.
  */
object ParquetStats {

  /** (rowCount, column → (min, max) rendered as strings). A column is
    * reported only when EVERY column chunk of EVERY file in the dir
    * carries usable min/max for it — pruning on a partial bound would
    * be wrong. Numeric bounds render via `.toString`; compare them
    * numerically through [[numeric]]. */
  def harvest(spark: SparkSession,
              dir: String): (Long, Map[String, (String, String)]) = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return (0L, Map.empty)
    val files = fs.listStatus(p).filter(st => st.isFile &&
      !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
    var rows = 0L
    // per-column fold across every chunk of every file; a single chunk
    // without usable stats poisons the column
    val mins = scala.collection.mutable.Map.empty[String, Comparable[Any]]
    val maxs = scala.collection.mutable.Map.empty[String, Comparable[Any]]
    val poisoned = scala.collection.mutable.Set.empty[String]
    val chunkCounts = scala.collection.mutable.Map.empty[String, Long]
    var totalBlocks = 0L
    files.foreach { st =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
        st.getPath, spark.sparkContext.hadoopConfiguration))
      try {
        val md = reader.getFooter
        val schema = md.getFileMetaData.getSchema
        md.getBlocks.forEach { block =>
          rows += block.getRowCount
          totalBlocks += 1
          block.getColumns.forEach { chunk =>
            val path = chunk.getPath.toArray
            if (path.length == 1) {
              val name = path(0)
              chunkCounts(name) = chunkCounts.getOrElse(name, 0L) + 1
              val stats = chunk.getStatistics
              if (!usableType(schema, name) || stats == null ||
                  !stats.hasNonNullValue ||
                  stats.genericGetMin == null || stats.genericGetMax == null)
                poisoned += name
              else {
                val mn = render(stats.genericGetMin.asInstanceOf[AnyRef])
                val mx = render(stats.genericGetMax.asInstanceOf[AnyRef])
                if (!mins.contains(name) || mn.compareTo(mins(name)) < 0)
                  mins(name) = mn
                if (!maxs.contains(name) || mx.compareTo(maxs(name)) > 0)
                  maxs(name) = mx
              }
            }
          }
        }
      } finally reader.close()
    }
    // a column absent from some block (in-dir schema drift) cannot prune
    val cols = mins.keySet.filterNot(poisoned)
      .filter(c => chunkCounts(c) == totalBlocks)
      .map(c => c -> (mins(c).toString, maxs(c).toString)).toMap
    (rows, cols)
  }

  /** Per-FILE footer stats of a directory's data files: (file name,
    * (rows, column → (min, max))) in listing order — the selection input
    * for file-scoped MERGE rewrites and small-file compaction. Same
    * capture rules as [[harvest]], applied one file at a time (harvest
    * of a single-file path degenerates to exactly that file). */
  def harvestPerFile(spark: SparkSession, dir: String)
      : Seq[(String, (Long, Map[String, (String, String)]))] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Nil
    fs.listStatus(p).filter(st => st.isFile &&
        !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith(".")).toSeq
      .map(st => st.getPath.getName -> harvest(spark, st.getPath.toString))
  }

  private def usableType(schema: org.apache.parquet.schema.MessageType,
                         name: String): Boolean = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val field = schema.getType(Seq(name): _*)
    field.isPrimitive && {
      val pt = field.asPrimitiveType().getPrimitiveTypeName
      val logical = field.getLogicalTypeAnnotation
      val decimal =
        logical.isInstanceOf[LogicalTypeAnnotation.DecimalLogicalTypeAnnotation]
      (pt == INT32 && !decimal) || (pt == INT64 && !decimal) ||
        pt == FLOAT || pt == DOUBLE ||
        (pt == BINARY &&
          logical.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation])
    }
  }

  private def render(v: AnyRef): Comparable[Any] = (v match {
    case b: org.apache.parquet.io.api.Binary => b.toStringUsingUTF8
    case other => other
  }).asInstanceOf[Comparable[Any]]

  /** Numeric view of a rendered bound, when it parses. */
  def numeric(s: String): Option[Double] =
    try Some(s.toDouble) catch { case _: NumberFormatException => None }
}
