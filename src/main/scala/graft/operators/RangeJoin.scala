package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned range join: points ⋈ intervals on containment
  * (`lo <= point <= hi`) — price-band tagging, IP→geo ranges, time-slot
  * assignment. Spark plans a raw inequality join as
  * BroadcastNestedLoopJoin: every (point, interval) pair is tested —
  * quadratic, the classic 100 TB cliff.
  *
  * The binned encoding makes it an EQUI-join (the same trick behind
  * warehouse range-join optimizations): fix a bin width, give every point
  * its bin id, explode every interval into the bin ids it overlaps, hash
  * the two on bin equality, then apply the exact containment filter to
  * the candidates. Cost: one hash join on a dense long key + interval
  * fan-out of ~(span/binWidth) rows per interval. Pick `binWidth` near
  * the typical interval span so fan-out stays small; an interval wider
  * than `maxBinsPerInterval` bins fails LOUDLY at runtime (a silently
  * exploding fan-out is the failure mode this operator exists to avoid).
  */
object RangeJoin {

  /** Join each row of `points` to every row of `intervals` whose
    * [`loCol`, `hiCol`] (inclusive) contains `pointCol`. Output = interval
    * columns + point columns, one row per qualifying pair. */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Double,
                      maxBinsPerInterval: Int = 1024): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"pointInInterval: shared column names $overlap — alias one side first")
    val p = points.withColumn("__bin",
      floor(col(pointCol) / binWidth).cast("long"))
    val binLo = floor(col(loCol) / binWidth).cast("long")
    val binHi = floor(col(hiCol) / binWidth).cast("long")
    val fanOut = binHi - binLo + lit(1L)
    // inverted (lo > hi) or null-bounded intervals contain no point by
    // definition — they produce zero candidate bins here, matching the SQL
    // inequality-join result. The explicit branch matters: a negative
    // fanOut would otherwise slip under the cap guard and hand sequence()
    // a descending range (|fanOut| silent fan-out)
    val expanded = intervals.withColumn("__bin", explode(
      when(fanOut.isNull || fanOut < 1, array().cast("array<bigint>"))
        .when(fanOut <= maxBinsPerInterval, sequence(binLo, binHi))
        .otherwise(raise_error(concat(
          lit(s"range join: interval spans more than $maxBinsPerInterval " +
            s"bins at binWidth=$binWidth (fan-out "), fanOut,
          lit(") — raise binWidth or split the interval")))
          .cast("array<bigint>"))))
    expanded.join(p, "__bin")
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
