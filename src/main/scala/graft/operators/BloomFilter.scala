package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis.portableHash

/** Broadcastable Bloom-style membership filter — the semi-join reduction
  * a 100 TB anti/semi join wants: build a tiny position-set from the
  * small side's keys, broadcast it, and drop non-matching probe rows
  * SCAN-SIDE before any exchange (Spark's own runtime row-group filters
  * do exactly this internally; here it is a first-class, cross-engine-
  * deterministic operator).
  *
  * Representation: the k hash positions (mod `m`) of every build key,
  * deduplicated and sorted — semantically identical to an m-bit Bloom
  * bitset (a probe "may be present" iff ALL its k positions are set),
  * but expressible in pure Column algebra on BOTH sides of the oracle
  * (no bit twiddling): membership never false-negatives, false-positive
  * rate ≈ (set_bits/m)^k, and because the hashes are the engine's
  * portable md5 ladder, Spark and any mirroring engine compute the SAME
  * filter and the SAME false positives bit-for-bit.
  *
  * Scale shape: build = one scan + one ≤ m-element collect_set aggregate
  * (the filter row is ≤ m longs no matter how many build keys); probe =
  * broadcast nested-loop of ONE row + a row-local array_contains
  * conjunction — pushes to the probe scan, no shuffle, no join.
  */
object BloomFilter {

  private def positions(key: Column, m: Int, k: Int): Seq[Column] =
    (0 until k).map(i =>
      pmod(portableHash(concat(key.cast("string"), lit(s"#$i"))), lit(m.toLong)))

  /** One-row DataFrame holding the sorted distinct hash positions of
    * `key` over `df` (NULL keys contribute nothing, as in any join). */
  def build(df: DataFrame, key: Column, m: Int = 4096, k: Int = 2): DataFrame = {
    require(m > 0 && k > 0, "bloom: m and k must be positive")
    df.where(key.isNotNull)
      .select(explode(array(positions(key, m, k): _*)).as("__pos"))
      .agg(sort_array(collect_set(col("__pos"))).as("bloom_positions"))
  }

  /** Row-local membership test against the broadcast `bloom_positions`
    * column: true iff ALL k positions of `key` are set (and the key is
    * non-NULL). Usable directly as a filter or as a flag column when the
    * caller wants pass/fail counts without a second scan. */
  def mightContain(key: Column, m: Int = 4096, k: Int = 2): Column =
    key.isNotNull && positions(key, m, k)
      // bloom_positions is sort_array output: binary-search each probe
      // (log₂ m compares) instead of array_contains' linear scan of up
      // to m elements — same answer on the sorted set, ~300× fewer
      // compares per probe row at the default m=4096
      .map(p => graft.functions.FastExprs.sortedContains(col("bloom_positions"), p))
      .reduce(_ && _)

  /** Keep the probe rows whose key MAY be in the filter (all k positions
    * set). NULL probe keys drop, matching semi-join semantics. Exact
    * members always pass; non-members pass at ≈ (fill ratio)^k. */
  def prefilter(probe: DataFrame, key: Column, filter: DataFrame,
                m: Int = 4096, k: Int = 2): DataFrame =
    probe.crossJoin(broadcast(filter))
      .where(mightContain(key, m, k))
      .drop("bloom_positions")
}
