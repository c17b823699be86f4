package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Thin catalog façade over a Parquet warehouse directory — the engine's
  * stand-in for the reference's Iceberg namespaces/DDL
  * (reference: spark_jobs/gcs_bronze_to_silver.py:73-158 CREATE NAMESPACE /
  * CREATE TABLE IF NOT EXISTS, spark_jobs/gcs_silver_to_gold.py:150-322).
  *
  * Tables are directories `<warehouse>/<name>`; partitioned tables use
  * hive-style `col=value` subdirectories so Catalyst's
  * PruneFileSourcePartitions prunes scans on partition predicates.
  */
final class Catalog(spark: SparkSession, warehouse: String) {

  private def fs: FileSystem =
    new Path(warehouse).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def tablePath(name: String): String = s"$warehouse/$name"

  /** S12: existence probe (reference: gcs_silver_to_gold.py:100-109 DESCRIBE
    * try/except) — a readable parquet footer, not just a directory. */
  def tableExists(name: String): Boolean = {
    val p = new Path(tablePath(name))
    fs.exists(p) && (try { spark.read.parquet(tablePath(name)); true }
      catch { case _: org.apache.spark.sql.AnalysisException => false })
  }

  /** S4: idempotent table creation from a first batch (CREATE IF NOT EXISTS). */
  def createIfNotExists(name: String, df: DataFrame,
                        partitionCols: Seq[String] = Nil): Unit =
    if (!tableExists(name)) {
      val w = df.write.mode(SaveMode.ErrorIfExists)
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(tablePath(name))
    }

  def read(name: String): DataFrame = spark.read.parquet(tablePath(name))

  /** S3-as-table-name: also register as a temp view so spark.sql sees it. */
  def registerView(name: String): DataFrame = {
    val df = read(name)
    df.createOrReplaceTempView(name)
    df
  }

  /** SHOW TABLES (reference: gold_to_bigquery.py:100-115). */
  def listTables(): Seq[String] =
    if (!fs.exists(new Path(warehouse))) Nil
    else fs.listStatus(new Path(warehouse)).filter(_.isDirectory)
      .map(_.getPath.getName).toSeq.sorted

  def dropTable(name: String): Unit =
    fs.delete(new Path(tablePath(name)), true)
}

/** S10: driver-side Hadoop FileSystem directory listing — the reference's
  * GCS topic autodetection (gcs_bronze_to_silver.py:216-237), native in
  * Scala (no py4j hop). */
object FsUtils {
  def listSubdirs(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSeq.sorted
  }
}
