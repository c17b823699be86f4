package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    spark.read.parquet(s"$dir/region.parquet").groupBy("r_name").count().count()
    time("q22 run 1") { Queries.q22ExactDedupGroups(spark, dir).count() }
    time("q22 run 2") { Queries.q22ExactDedupGroups(spark, dir).count() }
    time("q21 run 1") { Queries.q21QualityScore(spark, dir).count() }
    time("q21 run 2") { Queries.q21QualityScore(spark, dir).count() }
    time("q17 run 1") { Queries.q17ExplodeTokens(spark, dir).count() }
    time("q15 run 1") { Queries.q15EventsJson(spark, dir).count() }
    time("q15 run 2") { Queries.q15EventsJson(spark, dir).count() }
    spark.stop()
  }
}
