package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway drive harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))
    val edges = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
      .withColumn("dst", lead(col("l_partkey"), 1).over(w))
      .where(col("dst").isNotNull && col("dst") =!= col("l_partkey"))
      .select(col("l_partkey").as("src"), col("dst"))
    val e = edges.distinct()
    println(s"[dbg] edges=${e.count()} nodes=${e.select(col("src").as("n"))
      .unionByName(e.select(col("dst").as("n"))).distinct().count()}")
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    println(s"[dbg] degsum=${deg.agg(sum("deg")).head().getLong(0)}")
    val r1 = graft.operators.Graph.pageRank(e, "src", "dst", iterations = 1)
    println(s"[dbg] r1 node=1: ${r1.where(col("node") === 1).head()}")
    println(s"[dbg] r1 sum=${r1.agg(sum("rank")).head().getLong(0)}")
  }
}
