package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis: for each user, the first time they completed
  * each stage of an event sequence IN ORDER (a stage-k event only counts
  * if it happens at-or-after that user's first qualified stage-(k-1)
  * event). The product-analytics companion to the event-stream tables the
  * reference ingests (events → sessions → conversion).
  *
  * Implementation: one hash exchange on the user, one per-partition sort;
  * each stage adds a projection carrying the RUNNING first-qualified
  * timestamp of the previous stage (`min(when(...))` over the running
  * window), so a stage-k row can check "has stage k-1 already happened"
  * without a self-join; the final per-user aggregate reuses the same
  * partitioning. Cascaded window + groupBy on one key — the at-scale cost
  * of a single groupBy, independent of funnel depth in shuffles (depth
  * only adds per-row projections).
  */
object Funnel {

  /** One row per user that completed stage 1: the first-completion
    * timestamp of every stage reached in order (NULL beyond), plus
    * `stages_completed`. Ties at equal timestamps resolve by `tieBreak`
    * (an earlier tie-break row is visible to a later one at the same ts).
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, tieBreak: String,
             stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, "funnel: need at least 2 stages")
    val running = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieBreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def firstQualified(stage: String, prev: Option[Column]): Column = {
      val qualifies = prev match {
        case Some(p) => col(typeCol) === stage && p.isNotNull
        case None    => col(typeCol) === stage
      }
      min(when(qualifies, col(tsCol)))
    }
    // stage k's qualification reads stage k-1's RUNNING first-ts, so each
    // stage is one more projection over the same window spec — Catalyst
    // plans them as stacked Window operators sharing one exchange + sort
    val withRunning = stages.init.zipWithIndex.foldLeft(events) {
      case (df, (stage, i)) =>
        val prev = if (i == 0) None else Some(col(s"__s${i - 1}"))
        df.withColumn(s"__s$i", firstQualified(stage, prev).over(running))
    }
    // the per-row expressions are fixed once computed, so the per-user
    // first-qualified ts is a plain min — and the groupBy reuses the
    // window's hashpartitioning(user): no second exchange
    val aggs = stages.zipWithIndex.map { case (stage, i) =>
      val prev = if (i == 0) None else Some(col(s"__s${i - 1}"))
      firstQualified(stage, prev).as(s"${stage}_ts")
    }
    val stageTs = stages.map(s => col(s"${s}_ts"))
    withRunning.groupBy(col(userCol))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("stages_completed",
        stageTs.map(c => when(c.isNotNull, 1).otherwise(0)).reduce(_ + _))
      .where(stageTs.head.isNotNull)
  }

  /** Last-touch attribution: each conversion event (type = `convType`)
    * credits its user's most recent PRECEDING non-conversion event type —
    * the marketing channel that "closed" — or `directLabel` when nothing
    * preceded. Returns one row per channel with conversions and summed
    * `valueCol` revenue (DECIMAL-routed: the report is addition-order-
    * independent, so it reconciles bit-for-bit against any other engine's
    * run — an attribution number that drifts by partitioning is a
    * finance-team incident).
    *
    * Scale shape: one exchange on the user for the carry-forward window
    * (the same partitioning the sessionize/funnel family uses), then a
    * tiny channel-count aggregate. No self-joins: "last preceding touch"
    * is `last(..., ignoreNulls)` over rows (−∞, −1]. */
  def lastTouchAttribution(events: DataFrame, userCol: String, tsCol: String,
                           typeCol: String, tieBreak: String,
                           convType: String, valueCol: String,
                           directLabel: String = "direct"): DataFrame = {
    val before = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieBreak))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("__touch",
        last(when(col(typeCol) =!= convType, col(typeCol)), ignoreNulls = true)
          .over(before))
      .where(col(typeCol) === convType)
      .groupBy(coalesce(col("__touch"), lit(directLabel)).as("channel"))
      .agg(count(lit(1)).as("conversions"),
        sum(col(valueCol).cast("decimal(28,10)")).cast("double").as("revenue"))
  }
}
