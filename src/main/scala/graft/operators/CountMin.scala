package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005):
  * frequency estimation over an unbounded item stream in FIXED memory —
  * `depth × width` counters total, independent of data volume. The
  * estimate for an item is the MIN of its `depth` counters; collisions
  * only ever inflate counts, so `estimate ≥ true count` always, and
  * `estimate ≤ true + εN` with probability 1−δ for width = ⌈e/ε⌉,
  * depth = ⌈ln 1/δ⌉.
  *
  * At 100 TB the exact token-frequency table is itself a giant shuffle
  * (every distinct token travels); the sketch build shuffles at most
  * `depth × width` counter rows out of the partial aggregates regardless
  * of corpus size, and the counter table then BROADCASTS to answer any
  * number of point queries join-free. Hashes are the engine-portable
  * md5-derived family, so a DuckDB/any-SQL replica computes bit-identical
  * counters and estimates — sketches you can ship between engines.
  */
object CountMin {

  /** Bucket of `item` in row `depth` (depth-salted portable 63-bit hash
    * mod `width`) — nonnegative in both signed and unsigned engines. */
  def bucketOf(item: Column, depth: Column, width: Int): Column =
    pmod(shiftrightunsigned(
      TextAnalysis.portableHash64(concat(depth.cast("string"), lit(":"), item)),
      1), lit(width.toLong))

  /** Build the counter table: one row per (depth, bucket) that received at
    * least one item (absent = 0). The `depth`-way fan-out happens
    * scan-side (a Generate over a literal array); the only shuffle is the
    * partial→final aggregate on (depth, bucket), whose world size is
    * depth·width rows. */
  def build(items: DataFrame, item: Column, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, "countmin: need depth >= 1, width >= 2")
    val depths = array((0 until depth).map(d => lit(d)): _*)
    items.select(item.as("__item"))
      .where(col("__item").isNotNull)
      .select(explode(depths).as("depth"), col("__item"))
      .groupBy(col("depth"), bucketOf(col("__item"), col("depth"), width).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-query the sketch for each distinct candidate item: estimate =
    * min over the item's `depth` counters. `counters` is depth·width rows
    * → broadcast; the probe never shuffles the sketch. */
  def estimate(counters: DataFrame, candidates: DataFrame, item: Column,
               depth: Int, width: Int): DataFrame = {
    val depths = array((0 until depth).map(d => lit(d)): _*)
    candidates.select(item.as("item")).where(col("item").isNotNull).distinct()
      .select(col("item"), explode(depths).as("depth"))
      .withColumn("bucket", bucketOf(col("item"), col("depth"), width))
      .join(broadcast(counters), Seq("depth", "bucket"))
      .groupBy("item").agg(min(col("cnt")).as("est"))
  }

  /** Heavy hitters: candidate items whose sketch estimate reaches
    * `threshold`. One-sided error means NO true heavy hitter is missed
    * (estimates never undercount); collisions can only add false
    * positives, bounded by the (depth, width) choice. */
  def heavyHitters(counters: DataFrame, candidates: DataFrame, item: Column,
                   depth: Int, width: Int, threshold: Long): DataFrame =
    estimate(counters, candidates, item, depth, width)
      .where(col("est") >= threshold)
}
