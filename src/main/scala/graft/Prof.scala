package graft
import org.apache.spark.sql.SparkSession
/** Dev profiling harness: run named queries N times in ONE warm JVM to
  * separate real plan cost from JIT/GC/bench-order noise (the per-round
  * Bench runs everything sequentially in one JVM, where one quadratic
  * query's GC pressure pollutes its neighbors' timings).
  * Usage: runMain graft.Prof <sfDir> <query>... */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args.drop(1); r <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).queryExecution.toRdd.foreach(_ => ())
      println(f"[prof] $q run$r ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
