package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.similarity.Similarity

/** Throwaway drive harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val q = emb.where(col("vec_id") < 5)

    val single = Similarity.lshTopK(emb, q, k = 10, planes = 6).count()
    val multi = Similarity.lshTopK(emb, q, k = 10, planes = 6, multiProbe = true).count()
    println(s"[drive] lsh results: single-probe=$single multi-probe=$multi")

    val cents = Similarity.trainCentroids(emb, nlist = 16, iters = 5)
    println(s"[drive] trained ${cents.length} centroids, dim=${cents.head.length}")
    val brute = Similarity.bruteForceTopK(emb, q, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfTrained = Similarity.ivfTopK(emb, q, k = 10, nlist = 16, nprobe = 4,
        centroids = cents).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfSeeded = Similarity.ivfTopK(emb, q, k = 10, nlist = 16, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[drive] recall@10 trained=${ivfTrained.intersect(brute).size / 50.0}" +
      s" seeded=${ivfSeeded.intersect(brute).size / 50.0}")
    spark.stop()
  }
}
