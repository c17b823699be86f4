package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway drive harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $tag ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    def edges = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"), col("l_partkey"))
      spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
        .withColumn("dst", lead(col("l_partkey"), 1).over(w))
        .where(col("dst").isNotNull && col("dst") =!= col("l_partkey"))
        .select(col("l_partkey").as("src"), col("dst"))
    }
    // warm
    time("warm scan")(spark.read.parquet(s"$dir/lineitem.parquet").count())
    time("q90 exact")(graft.operators.Graph.triangleCounts(edges).queryExecution.toRdd.foreach(_=>()))
    time("q162 estimate")(graft.operators.Graph.triangleEstimate(edges).queryExecution.toRdd.foreach(_=>()))
    // components
    val canon = time("canon distinct+ckpt") {
      edges.select(least(col("src"),col("dst")).as("a"), greatest(col("src"),col("dst")).as("b"))
        .where(col("a").isNotNull && col("a") =!= col("b")).distinct().localCheckpoint()
    }
    val sampled = canon.where(pmod(graft.text.TextAnalysis.portableHash(
      concat_ws("_", col("a"), col("b"))), lit(2L)) < lit(1L))
    time("hash filter count")(println("sampled=" + sampled.count()))
    time("tri on sampled")(graft.operators.Graph.triangleCounts(sampled, "a", "b")
      .agg(sum("triangles")).queryExecution.toRdd.foreach(_=>()))
    time("stats aggs")(canon.agg(count(lit(1))).crossJoin(sampled.agg(count(lit(1)))).queryExecution.toRdd.foreach(_=>()))
  }
}
