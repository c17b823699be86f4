package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) builder: turn a change log
  * (key, ts, attributes) into versioned dimension rows with effective-time
  * ranges — the standard Kimball pattern for "what did this dimension row
  * look like when the fact happened". The reference rebuilds dims as
  * latest-state type 1 (reference: spark_jobs/gcs_silver_to_gold.py:329-541);
  * type 2 is the history-preserving upgrade a warehouse user expects next,
  * and it pairs with [[AsOfJoin]] for point-in-time fact enrichment.
  *
  * Plan shape: ONE hash exchange on `key`, then everything — the
  * change-detection lag, the run numbering, the per-run aggregate, and the
  * effective_to lead — reuses that partitioning (Catalyst keeps
  * `hashpartitioning(key)` through the groupBy because the grouping key
  * (key, version) is a superset, and both windows cluster by `key`). At
  * 100 TB the cost is the same as a single groupBy on the key; no
  * self-joins, no per-version passes.
  */
object Scd {

  /** Collapse `log` into type-2 dimension rows.
    *
    * Consecutive rows of a key (ordered by `tsCol`, ties by `tieBreak`)
    * with identical `attrCols` form one version; each version row carries
    * `effective_from` (its first ts), `effective_to` (next version's
    * from; NULL while current), 1-based `version`, and `is_current`.
    * Attribute comparison is null-safe: NULL == NULL is "no change".
    */
  def scd2(log: DataFrame, key: String, tsCol: String, tieBreak: String,
           attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "scd2: attrCols must be non-empty")
    val reserved = Seq("version", "effective_from", "effective_to", "is_current")
    require(!attrCols.exists(reserved.contains),
      s"scd2: attrCols may not use reserved names $reserved")
    val byTime = Window.partitionBy(col(key)).orderBy(col(tsCol), col(tieBreak))
    val attrs = struct(attrCols.map(col): _*)
    // run id = running count of change points (first row of a key is one)
    val versioned = log
      .withColumn("__prev", lag(attrs, 1).over(byTime))
      .withColumn("__chg",
        when(row_number().over(byTime) === 1 || !(attrs <=> col("__prev")), 1)
          .otherwise(0))
      .withColumn("version",
        sum(col("__chg")).over(byTime.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).cast("int"))
    // attrs are constant within a run, so max() is just "the value" —
    // deterministic without an order-sensitive first()
    val runs = versioned.groupBy(col(key), col("version"))
      .agg(min(col(tsCol)).as("effective_from"),
        attrCols.map(c => max(col(c)).as(c)): _*)
    val byVersion = Window.partitionBy(col(key)).orderBy(col("version"))
    runs
      .withColumn("effective_to", lead(col("effective_from"), 1).over(byVersion))
      .withColumn("is_current", col("effective_to").isNull)
      .select((col(key) +: attrCols.map(col)) ++
        Seq(col("version"), col("effective_from"), col("effective_to"),
          col("is_current")): _*)
  }
}
