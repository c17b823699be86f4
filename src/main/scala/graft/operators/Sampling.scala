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
}
