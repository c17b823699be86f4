package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis.portableHash

/** Data reconciliation for migrations and replica validation: prove two
  * tables (possibly in two engines) hold the same rows without moving
  * either.
  *
  * Both operators hash rows with the engine-portable md5-digit hash
  * (TextAnalysis.portableHash — reproducible in any SQL engine), so a
  * checksum computed by this library can be compared against one computed
  * by DuckDB/Trino/etc. on the other side of a migration.
  *
  * Scale shape: `checksum` is a full-scan + single agg (sum is
  * order-insensitive, so partitioning never changes the result; per-row
  * hashes are ≤ 1e8, so 1e11 rows still fit a signed 64-bit sum).
  * `diff` is one full-outer shuffle join on the key columns — the minimal
  * movement that can prove per-row equality.
  */
object Reconcile {

  /** Portable row digest over `cols`, NULL-safe: values joined by \\u0001
    * and NULL encoded as \\u0002-prefixed marker — control characters that
    * cannot appear in normal text, unlike plain concat_ws NULL-skipping
    * (which makes ("a", NULL) indistinguishable from ("a")). */
  private def rowDigest(cols: Seq[String]): Column =
    portableHash(concat_ws("\u0001",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0002NULL"))): _*))

  /** Order-insensitive table checksum: one row of
    * (n_rows, checksum = Σ portableHash(row)). Compare against the same
    * expression run by any other engine over the claimed-identical table.
    * Restrict `cols` to exactly-stringifiable types (ints, strings,
    * dates); float formatting differs across engines and belongs in an
    * epsilon compare, not a checksum. */
  def checksum(df: DataFrame, cols: Seq[String]): DataFrame =
    df.agg(count(lit(1)).as("n_rows"), sum(rowDigest(cols)).as("checksum"))

  /** Keyed diff of two tables: one row per key whose row content differs,
    * with status `added` (right only), `removed` (left only), or `changed`
    * (both, different non-key values). Identical rows are absent — at
    * 100 TB the interesting output is the delta, not a copy of the table. */
  def diff(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame = {
    val nonKey = left.columns.filterNot(keys.contains).toSeq
    require(right.columns.filterNot(keys.contains).toSeq == nonKey,
      "diff requires identical schemas on both sides")
    val l = left.select(keys.map(col) :+ rowDigest(nonKey).as("__lh"): _*)
    val r = right.select(keys.map(col) :+ rowDigest(nonKey).as("__rh"): _*)
    l.join(r, keys, "full_outer")
      .select(keys.map(col) :+
        when(col("__rh").isNull, lit("removed"))
          .when(col("__lh").isNull, lit("added"))
          .when(col("__lh") =!= col("__rh"), lit("changed"))
          .otherwise(lit("same")).as("status"): _*)
      .where(col("status") =!= "same")
  }
}
