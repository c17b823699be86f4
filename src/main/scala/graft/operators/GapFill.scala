package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series gap filling over sparse per-key observations — the feature
  * hygiene step before any model sees a daily metric: missing periods
  * become explicit rows, filled by linear interpolation between the
  * surrounding observations (falling back to carry-forward/backward at
  * the edges), with an `is_observed` flag so downstream code can still
  * tell imputed values from real ones.
  *
  * Scale shape: the spine is generated PER KEY from that key's own
  * [min, max] period range (`sequence` + explode — no driver loop, no
  * global calendar join), and both the prev- and next-observation
  * carries are `last/first(..., ignoreNulls)` running windows over ONE
  * exchange on the key. Interpolation is a row-local projection. Keys ×
  * days explode the row count by design — that IS the densification; cap
  * the key set or range upstream if the product is unbounded.
  */
object GapFill {

  /** Densify `(key, period, value)` to one row per key-period in the
    * key's observed [min, max] range. `periodCol` must be an integral
    * day/hour/bucket number (use [[graft.Queries.floorDiv]]-style
    * arithmetic to derive one). Output: key, period, `value_filled`,
    * `is_observed`. */
  def fill(df: DataFrame, keyCol: String, periodCol: String,
           valueCol: String): DataFrame = {
    val obs = df.select(col(keyCol), col(periodCol).cast("long").as("period"),
      col(valueCol).cast("double").as("__v"))
    val spine = obs.groupBy(col(keyCol))
      .agg(min(col("period")).as("__lo"), max(col("period")).as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"))).as("period"))
    val joined = spine.join(obs, Seq(keyCol, "period"), "left")
    val back = Window.partitionBy(col(keyCol)).orderBy(col("period"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col(keyCol)).orderBy(col("period"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    joined
      .withColumn("__pv", last(col("__v"), ignoreNulls = true).over(back))
      .withColumn("__pd", last(when(col("__v").isNotNull, col("period")),
        ignoreNulls = true).over(back))
      .withColumn("__nv", first(col("__v"), ignoreNulls = true).over(fwd))
      .withColumn("__nd", first(when(col("__v").isNotNull, col("period")),
        ignoreNulls = true).over(fwd))
      .select(col(keyCol), col("period"),
        when(col("__v").isNotNull, col("__v"))
          .when(col("__pv").isNotNull && col("__nv").isNotNull,
            col("__pv") + (col("__nv") - col("__pv"))
              * (col("period") - col("__pd")).cast("double")
              / (col("__nd") - col("__pd")).cast("double"))
          .when(col("__pv").isNotNull, col("__pv")) // trailing edge: LOCF
          .otherwise(col("__nv")) // leading edge: backfill
          .as("value_filled"),
        col("__v").isNotNull.as("is_observed"))
  }
}
