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

  /** Recover from a crash between compactDir's two swap renames: the
    * directory is gone but its `.name__precompact` sibling survives —
    * restore it. Called before every compaction (same pattern as
    * Upsert.recoverSwap). */
  private def recoverSwap(spark: SparkSession, p: Path): Unit = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new Path(p.getParent, s".${p.getName}__precompact")
    if (!fs.exists(p) && fs.exists(old)) {
      if (!fs.rename(old, p))
        throw new IllegalStateException(s"compact recovery: rename $old -> $p failed")
    } else if (fs.exists(p)) fs.delete(old, true) // stale leftover
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
    recoverSwap(spark, p)
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

  /** Compact every LEAF hive-style partition directory of a partitioned
    * table (recursing through multi-level `a=1/b=2` layouts; the root
    * itself when unpartitioned). Returns per-directory (before, after)
    * counts keyed by table-relative path. */
  def compactTable(spark: SparkSession, table: String,
                   targetFileBytes: Long = 128L * 1024 * 1024,
                   minFiles: Int = 4): Map[String, (Int, Int)] = {
    val root = new Path(table)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the table ROOT itself can be the directory stranded mid-swap (an
    // unpartitioned compaction crash) — restore it before listing anything
    recoverSwap(spark, root)
    def leafDirs(p: Path): Seq[Path] = {
      // a partition dir stranded mid-swap is invisible here (it was
      // renamed to its hidden `.name__precompact` sibling) — restore it
      // BEFORE listing, or the partition's rows stay hidden from every
      // reader and the hidden dir could be mistaken for a leaf
      fs.listStatus(p).map(_.getPath.getName)
        .filter(n => n.startsWith(".") && n.endsWith("__precompact"))
        .foreach { n =>
          recoverSwap(spark, new Path(p, n.stripPrefix(".").stripSuffix("__precompact")))
        }
      val parts = fs.listStatus(p)
        .filter(s => s.isDirectory && s.getPath.getName.contains("=") &&
          !s.getPath.getName.startsWith(".") && !s.getPath.getName.startsWith("_"))
        .map(_.getPath).toSeq
      if (parts.isEmpty) Seq(p) else parts.flatMap(leafDirs)
    }
    val leaves = leafDirs(root)
    if (leaves == Seq(root))
      Map("." -> compactDir(spark, table, targetFileBytes, minFiles))
    else {
      // listed paths come back fs-qualified (file:/...); qualify the root
      // the same way or the relative-path strip silently no-ops
      val rootQ = fs.makeQualified(root).toString
      leaves.map { d =>
        val rel = d.toString.stripPrefix(rootQ).stripPrefix("/")
        rel -> compactDir(spark, d.toString, targetFileBytes, minFiles)
      }.toMap
    }
  }
}
