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
  * number of point queries join-free.
  *
  * The `depth` rows use Kirsch–Mitzenmacher double hashing (ESA 2006):
  * bucket_d = (h1 + d·h2') mod width with h1, h2 the two 64-bit halves of
  * ONE md5 digest (h2' forced nonzero so rows stay distinct). One digest
  * per item occurrence — computed BEFORE the depth fan-out, so the
  * exploded rows carry two longs, not re-hashed strings — and the whole
  * family is engine-portable: a DuckDB/any-SQL replica computes
  * bit-identical counters and estimates.
  */
object CountMin {

  /** (h1 mod w, step) pair of an item: bucket_d = (h1m + d·step) mod w.
    * Both components nonnegative; `step` in [1, w-1] so the d rows are
    * distinct buckets whenever w is prime (and near-distinct otherwise). */
  private def hashCols(item: Column, width: Int): (Column, Column) = {
    val h1 = shiftrightunsigned(TextAnalysis.portableHash64(item), 1)
    val h2 = shiftrightunsigned(TextAnalysis.portableHash64b(item), 1)
    (pmod(h1, lit(width.toLong)), pmod(h2, lit(width.toLong - 1)) + lit(1L))
  }

  private def bucketAt(depth: Column, width: Int): Column =
    pmod(col("__h1m") + depth.cast("long") * col("__step"), lit(width.toLong))

  /** Build the counter table: one row per (depth, bucket) that received at
    * least one item (absent = 0). The item is digested once scan-side;
    * the `depth`-way fan-out (a Generate over a literal array) carries
    * only the two hash longs; the only shuffle is the partial→final
    * aggregate on (depth, bucket), whose world size is depth·width rows. */
  def build(items: DataFrame, item: Column, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, "countmin: need depth >= 1, width >= 2")
    val depths = array((0 until depth).map(d => lit(d)): _*)
    val (h1m, step) = hashCols(col("__item"), width)
    items.select(item.as("__item"))
      .where(col("__item").isNotNull)
      .select(h1m.as("__h1m"), step.as("__step"))
      .select(explode(depths).as("depth"), col("__h1m"), col("__step"))
      .groupBy(col("depth"), bucketAt(col("depth"), width).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge two counter tables of the same (depth, width) geometry:
    * element-wise sum. CMS is a LINEAR sketch — counters maintained per
    * micro-batch, per shard, or per engine add up to exactly the counters
    * of the concatenated stream, so incremental maintenance (e.g. inside
    * a streaming `foreachBatch`) never revisits history. */
  def mergeCounters(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("depth"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Point-query the sketch for each distinct candidate item: estimate =
    * min over the item's `depth` counters. `counters` is depth·width rows
    * → broadcast; the probe never shuffles the sketch. An absent
    * (depth, bucket) row means that counter is 0, so a candidate the
    * stream never touched estimates 0 (left join + coalesce), not a
    * missing row. */
  def estimate(counters: DataFrame, candidates: DataFrame, item: Column,
               depth: Int, width: Int): DataFrame = {
    val depths = array((0 until depth).map(d => lit(d)): _*)
    val (h1m, step) = hashCols(col("item"), width)
    candidates.select(item.as("item")).where(col("item").isNotNull).distinct()
      .select(col("item"), h1m.as("__h1m"), step.as("__step"))
      .select(col("item"), explode(depths).as("depth"), col("__h1m"), col("__step"))
      .withColumn("bucket", bucketAt(col("depth"), width))
      .join(broadcast(counters), Seq("depth", "bucket"), "left")
      .groupBy("item").agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
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
