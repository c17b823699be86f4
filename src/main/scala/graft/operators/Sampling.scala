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

  /** Keep ~`fraction` of rows, decided by the key hash. */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame =
    df.where(sampleBucket(key) < lit((fraction * Buckets).toLong))

  /** Per-stratum fractions (e.g. by language), `default` elsewhere. */
  def stratifiedHashSample(df: DataFrame, key: Column, strata: Column,
                           fractions: Map[String, Double],
                           default: Double = 0.0): DataFrame = {
    val threshold = fractions.foldLeft(lit((default * Buckets).toLong)) {
      case (acc, (value, f)) =>
        when(strata === value, lit((f * Buckets).toLong)).otherwise(acc)
    }
    df.where(sampleBucket(key) < threshold)
  }
}
