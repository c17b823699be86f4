package graft

import org.apache.spark.sql.SparkSession

/** Throwaway drive harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val l = Seq((1, "a")).toDF("k", "v")
    val r = Seq((1, "x"), (2, "y")).toDF("k", "w")
    try {
      graft.operators.Skew.saltedJoin(l, r, Seq("k"), 4, joinType = "full").count()
      println("[drive] GUARD MISSED: full outer accepted")
    } catch {
      case e: IllegalArgumentException => println(s"[drive] guard ok: ${e.getMessage}")
    }
    println("[drive] left join rows: " +
      graft.operators.Skew.saltedJoin(l, r, Seq("k"), 4, joinType = "left").count())
    spark.stop()
  }
}
