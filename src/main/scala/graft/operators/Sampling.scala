package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis.portableHash

/** Deterministic, engine-portable sampling.
  *
  * `rand()`-based sampling is not reproducible across runs, engines, or
  * repartitionings — useless for training-data lineage. Hash sampling
  * decides membership per row from a stable key: the same row is in the
  * same sample everywhere, samples of different fractions nest
  * (f1 < f2 ⇒ sample(f1) ⊆ sample(f2)), and the filter is a pure
  * projection predicate — it pushes into the scan and costs no shuffle.
  */
object Sampling {

  private val Buckets = 10000L

  /** Membership bucket in [0, 10000) from the key's string form. */
  def sampleBucket(key: Column): Column =
    pmod(portableHash(key.cast("string")), lit(Buckets))

  /** Bucket threshold for a fraction — rounded, not truncated: 0.29*10000
    * is 2899.9999999999995 in IEEE double and .toLong would under-sample
    * by a bucket. */
  private def thresholdOf(fraction: Double): Long = math.round(fraction * Buckets)

  /** Keep ~`fraction` of rows, decided by the key hash. */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame =
    df.where(sampleBucket(key) < lit(thresholdOf(fraction)))

  /** Per-stratum fractions (e.g. by language), `default` elsewhere. */
  def stratifiedHashSample(df: DataFrame, key: Column, strata: Column,
                           fractions: Map[String, Double],
                           default: Double = 0.0): DataFrame = {
    val threshold = fractions.foldLeft(lit(thresholdOf(default))) {
      case (acc, (value, f)) =>
        when(strata === value, lit(thresholdOf(f))).otherwise(acc)
    }
    df.where(sampleBucket(key) < threshold)
  }

  /** Deterministic sharded corpus shuffle — the global randomization every
    * pretraining run needs, without a global sort: shard = key-hash mod
    * `numShards` (one hash partition each), position = rank of the salted
    * hash *within* the shard. Changing `salt` reshuffles epochs
    * reproducibly; the same (corpus, salt) gives the same order on any
    * engine, run, or partitioning. Scale shape: the only exchange is the
    * hash partition on `shard`, and each shard sorts independently — no
    * single-partition bottleneck, unlike orderBy(hash) over the corpus. */
  def shardedShuffle(df: DataFrame, key: Column, salt: String,
                     numShards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = portableHash(concat(key.cast("string"), lit(salt)))
    val withShard = df.withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(numShards.toLong)).cast("int"))
    withShard
      .withColumn("pos", row_number().over(
        // hash then key: the key tiebreak keeps the order total when two
        // keys collide on the 8-digit hash
        Window.partitionBy(col("shard")).orderBy(col("__h"), key)))
      .drop("__h")
  }

  /** Sequence packing by token budget — concat-then-chunk document packing
    * for pretraining batches: in deterministic shuffle order within each
    * shard, a document's bin is the context window its FIRST token falls
    * into (`floor(tokensBefore / budget)`), so bins are filled greedily in
    * order and the assignment is a pure running-sum window — fully
    * parallel per shard, reproducible everywhere. `tokens` must be a
    * per-row token count column. */
  def packByTokenBudget(shuffled: DataFrame, tokens: Column,
                        budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val order = Window.partitionBy(col("shard")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    shuffled
      .withColumn("bin",
        floor(coalesce(sum(tokens).over(order), lit(0L)) / lit(budget)))
  }

  /** Largest-remainder apportionment of `totalN` slots across integer
    * `weights` — exact integer arithmetic, so every engine and run derives
    * the identical quotas. Σ quotas = totalN. Pure config math (no data). */
  def apportion(weights: Seq[(String, Long)], totalN: Long): Seq[(String, Long)] = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "apportion: weights must be positive")
    require(totalN > 0, s"apportion: totalN must be positive, got $totalN")
    val w = weights.map(_._2).sum
    val base = weights.map { case (g, wg) => (g, totalN * wg / w, totalN * wg % w) }
    val leftover = (totalN - base.map(_._2).sum).toInt
    val bonus = base.sortBy { case (g, _, rem) => (-rem, g) }
      .take(leftover).map(_._1).toSet
    base.map { case (g, q, _) => (g, q + (if (bonus(g)) 1L else 0L)) }
  }

  /** Data-mixture resampling: draw a deterministic sample of ~`totalN`
    * rows whose GROUP composition follows `weights` (the
    * Pile/DoReMi-style domain-mixture step a pretraining corpus is built
    * with): per-group quotas by largest-remainder apportionment
    * ([[apportion]]), then each group keeps its `quota` first rows in
    * salted-hash order. Groups smaller than their quota contribute
    * everything they have (the sample comes up short rather than
    * over-weighting a small domain).
    *
    * One exchange on the group column; the per-group rank sorts (hash,
    * key) pairs only. Rows outside `weights` drop scan-side, BEFORE the
    * exchange. Reproducible on any engine: quotas are integer config
    * math and the order is the portable salted hash. */
  def mixtureSample(df: DataFrame, group: Column, key: Column,
                    weights: Seq[(String, Long)], totalN: Long,
                    salt: String = ""): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val quotas = apportion(weights, totalN)
    val quotaCol = quotas.foldLeft(lit(0L)) { case (acc, (g, q)) =>
      when(group === g, lit(q)).otherwise(acc)
    }
    val h = portableHash(concat(key.cast("string"), lit(salt)))
    df.where(group.isin(weights.map(_._1): _*))
      .withColumn("__rank", row_number().over(
        Window.partitionBy(group).orderBy(h, key)))
      .where(col("__rank") <= quotaCol)
      .withColumn("sample_rank", col("__rank").cast("int"))
      .drop("__rank")
  }

  /** Exact global prefix sum of `valueCol` (long) in the deterministic
    * total order (keyShard, key), WITHOUT a single-partition global
    * window: one exchange on the hash shard, a per-shard running sum, and
    * each shard's broadcast offset added back (the classic two-phase
    * distributed scan). Hash shards rather than range partitions because
    * RangePartitioner SAMPLES its boundaries per job — the offsets job
    * and the output job could disagree — while the key hash is a pure
    * row-local function, identical in every job and engine. The price is
    * that the traversal order is the sharded order, not raw key order;
    * for cumulative-weight uses (resampling, quota fills) any fixed total
    * order is equally valid, and this one costs no global sort. The only
    * driver-side materialization is one long per shard. Emits `lo` (sum
    * of strictly-preceding weights) and `hi` (= lo + weight); `orderCol`
    * must be unique for the order to be total. */
  def prefixSum(df: DataFrame, orderCol: String, valueCol: String,
                shards: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(shards > 0, "prefixSum: shards must be positive")
    val sharded = df
      .select(col(orderCol), col(valueCol).cast("long").as("__w"))
      .withColumn("__shard",
        pmod(portableHash(col(orderCol).cast("string")), lit(shards.toLong))
          .cast("int"))
    val totals = sharded.groupBy("__shard")
      .agg(sum(col("__w")).as("__t"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    val offsets = totals.scanLeft(0L)(_ + _._2).init
    val offCol = totals.map(_._1).zip(offsets)
      .foldLeft(lit(0L)) { case (acc, (sh, off)) =>
        when(col("__shard") === sh, lit(off)).otherwise(acc)
      }
    val run = Window.partitionBy(col("__shard")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sharded
      .withColumn("hi", offCol + sum(col("__w")).over(run))
      .select(col(orderCol), col("__w").as("weight"),
        (col("hi") - col("__w")).as("lo"), col("hi"))
  }

  /** Systematic (low-variance) weighted resampling — the particle-filter /
    * data-mixing standard: k picks at equally spaced positions
    * (2j+1)·W ∕ 2k in cumulative-weight space, so an item of weight w is
    * drawn ⌊k·w/W⌋ or ⌈k·w/W⌉ times, never more variance than that.
    * ALL-INTEGER arithmetic (positions by floor division over exact long
    * cumsums) — every engine derives the identical sample, no float
    * boundary can flip a pick. Returns (key, weight, n_picks > 0).
    *
    * Scale shape: cumulative intervals come from [[prefixSum]] (no global
    * window); the k positions are a broadcast range probe against
    * [lo, hi). Weights must be positive longs; zero-weight rows never
    * match an interval and are dropped up front.
    *
    * `keyCol` must be UNIQUE: it is [[prefixSum]]'s total-order key (a
    * duplicate key makes the cumulative order itself ill-defined). Under
    * that contract the closed-form row emits exactly the rows the
    * explicit positions-join shape did; duplicate-key inputs are out of
    * contract for both shapes. */
  def systematicWeightedSample(df: DataFrame, keyCol: String,
                               weightCol: String, k: Int): DataFrame = {
    require(k > 0, "systematicWeightedSample: k must be positive")
    val c = prefixSum(
      df.select(col(keyCol), col(weightCol).cast("long").as("__w"))
        .where(col("__w") > 0), keyCol, "__w")
    // The k probe positions pos_j = (2j+1)·W div 2k are MONOTONE in j, so
    // the j hitting a row's [lo, hi) form a contiguous range with closed-
    // form endpoints — n_picks is a row-local integer formula, not a
    // positions×rows nested-loop join (the previous shape paid k predicate
    // evaluations per row in a BroadcastNestedLoopJoin plus a groupBy):
    //   pos_j ≥ lo ⟺ (2j+1)W ≥ 2k·lo ⟺ j ≥ (⌈2k·lo/W⌉) div 2
    //   pos_j < hi ⟺ (2j+1)W ≤ 2k·hi−1 ⟺ j ≤ (⌊(2k·hi−1)/W⌋ − 1) div 2
    //     (no j at all when that floor is 0 — guarded below)
    // All operands are ≥ 0 longs, so Spark's truncating `div` ≡ floor and
    // ⌈a/b⌉ = (a + b − 1) div b. Equivalence to the explicit positions
    // join is pinned property-style in SamplingSpec.
    val k2 = 2L * k
    c.crossJoin(broadcast(c.agg(max(col("hi")).as("__W"))))
      .withColumn("__jmin", expr(s"(($k2 * lo + __W - 1) div __W) div 2"))
      .withColumn("__jmax", least(lit(k - 1L), expr(
        s"CASE WHEN ($k2 * hi - 1) div __W >= 1" +
          s" THEN ((($k2 * hi - 1) div __W) - 1) div 2 ELSE -1 END")))
      .withColumn("n_picks",
        greatest(lit(0L), col("__jmax") - col("__jmin") + 1))
      .where(col("n_picks") > 0)
      .select(col(keyCol), col("weight"), col("n_picks"))
  }

  /** Materialize the packed training sequences: per (shard, bin), the
    * documents' text concatenated in shuffle order with a separator —
    * the rows a pretraining loader actually reads. One aggregation on
    * (shard, bin); order inside each sequence is made deterministic by
    * sorting the collected (pos, text) structs, not by relying on task
    * arrival order (collect_list is order-unstable across retries). */
  def packedSequences(packed: DataFrame, textCol: String,
                      sep: String = " "): DataFrame =
    packed.groupBy(col("shard"), col("bin"))
      .agg(
        concat_ws(sep, transform(
          array_sort(collect_list(struct(col("pos"), col(textCol)))),
          s => s.getField(textCol))).as("packed_text"),
        count(lit(1)).as("n_docs"))
}
