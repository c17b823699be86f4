package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators.
  *
  * AQE's skew-join (spark.sql.adaptive.skewJoin, on by default) already
  * splits oversized sort-merge partitions at runtime; these helpers cover
  * the cases AQE can't re-plan:
  *  - broadcast-ineligible dimension joins where one key dominates
  *    (saltedJoin: shard the hot key across `saltFactor` reducers),
  *  - holistic aggregations (collect_list/set) where map-side partial
  *    aggregation can't shrink a hot group (saltedAgg: two-phase).
  *
  * Salting is deterministic (monotonic row id mod factor) so plans stay
  * replayable; the salt never leaks into results.
  */
object Skew {

  /** Equi-join `skewed ⋈ other` on `keys`, sharding each skewed key across
    * `saltFactor` sub-keys. The other side is replicated `saltFactor`× —
    * appropriate when it is dimension-sized but above the broadcast
    * threshold. Result is identical to the plain join. */
  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    // right/full outer would emit saltFactor copies of each unmatched
    // right-side row (the replicated side); only these types are sound
    require(Set("inner", "left", "left_outer", "leftouter", "cross")(joinType.toLowerCase),
      s"saltedJoin supports inner/left joins, not $joinType: the replicated " +
        "right side would duplicate unmatched rows under right/full outer")
    val l = skewed.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)).cast("int"))
    val r = other.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-phase aggregation for skewed group keys: pre-aggregate on
    * (keys, salt), then merge per key. `partial` builds the salted-level
    * aggregate columns; `merge` combines them to the final value. */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltFactor: Int,
                partial: Seq[Column], merge: Seq[Column]): DataFrame =
    df.withColumn("__salt",
        pmod(monotonically_increasing_id(), lit(saltFactor.toLong)).cast("int"))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
}
