package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.functions.FastExprs

/** Throwaway profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // bit-identity: fast expr vs Column-algebra HOF signature
    val mismatch = docs.limit(200).select(
      Dedup.minHashSignature(Dedup.shingles(col("text"))).as("hof"),
      FastExprs.minHashSignature(col("text"), 3, 16).as("fast"))
      .where(not(col("hof") === col("fast"))).count()
    println(s"[scratch] signature mismatches (200 docs): $mismatch")

    time("fast signatures full corpus") {
      docs.select(FastExprs.minHashSignature(col("text"), 3, 16).as("sig"))
        .select(sum(size(col("sig")))).collect()
    }
    time("minhash dedup end-to-end") {
      println(s"[scratch] n_pairs=${Dedup.minHashDedup(docs, 0.5).count()}")
    }
    time("embedding near-dup (cap 300)") {
      val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      println(s"[scratch] n_neardup=${Dedup.embeddingNearDup(emb, 0.3, 300).count()}")
    }
    spark.stop()
  }
}
