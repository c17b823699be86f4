package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction for parquet warehouse tables — the operational
  * counterpart of Iceberg's rewrite_data_files. A streaming pipeline
  * committing micro-batches every few minutes (the reference's 24/7 file
  * stream, gcs_bronze_to_silver.py:501-573) accretes thousands of tiny
  * files per partition; at 100 TB that means a scan pays one open/footer
  * per KB-sized file and the NameNode/listing pays the metadata. Compaction
  * rewrites each oversized-file-count partition to ~`targetFileBytes`
  * files, preserving rows exactly.
  *
  * Scale shape: per-partition rewrite (same unit as Upsert's
  * partition-scoped merge) — each partition coalesces independently, so a
  * daily compaction touches only partitions the stream wrote that day;
  * nothing global, no shuffle (coalesce merges scan splits).
  */
object Compaction {

  /** Bytes of data files directly under `dir` (non-recursive). */
  private def dataFiles(spark: SparkSession, dir: Path) = {
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(dir).filter(s => s.isFile &&
      !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
  }

  /** Compact one table or partition directory in place: if it holds more
    * than `minFiles` data files, rewrite to ceil(bytes/targetFileBytes)
    * files via a staged write + atomic swap. Returns (filesBefore,
    * filesAfter). Row-preserving by construction (read → coalesce →
    * write of the same data). */
  def compactDir(spark: SparkSession, dir: String,
                 targetFileBytes: Long = 128L * 1024 * 1024,
                 minFiles: Int = 4): (Int, Int) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = dataFiles(spark, p)
    if (before.length <= minFiles) return (before.length, before.length)
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val staged = new Path(p.getParent, s".${p.getName}__compact")
    fs.delete(staged, true)
    spark.read.parquet(dir).coalesce(nOut)
      .write.mode(SaveMode.ErrorIfExists).parquet(staged.toString)
    val old = new Path(p.getParent, s".${p.getName}__precompact")
    fs.delete(old, true)
    if (!fs.rename(p, old))
      throw new IllegalStateException(s"compact swap: rename $p -> $old failed")
    if (!fs.rename(staged, p))
      throw new IllegalStateException(
        s"compact swap: rename $staged -> $p failed; data preserved at $old")
    fs.delete(old, true)
    (before.length, dataFiles(spark, p).length)
  }

  /** Compact every hive-style partition directory of a partitioned table
    * (or the root itself when unpartitioned). Returns per-directory
    * (before, after) counts keyed by relative path. */
  def compactTable(spark: SparkSession, table: String,
                   targetFileBytes: Long = 128L * 1024 * 1024,
                   minFiles: Int = 4): Map[String, (Int, Int)] = {
    val root = new Path(table)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val partDirs = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .map(_.getPath)
    if (partDirs.isEmpty)
      Map("." -> compactDir(spark, table, targetFileBytes, minFiles))
    else partDirs.map { d =>
      d.getName -> compactDir(spark, d.toString, targetFileBytes, minFiles)
    }.toMap
  }
}
