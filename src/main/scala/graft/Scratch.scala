package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.Streams

/** Throwaway drive harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def ts(minute: Int) = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = Streams.streamingDedup(
        mem.toDF().toDF("event_id", "ts", "payload"), Seq("event_id"), "ts", "10 minutes")
      .writeStream.format("memory").queryName("dd")
      .outputMode(OutputMode.Append()).start()
    mem.addData((1L, ts(0), "a"), (2L, ts(1), "b"), (1L, ts(2), "dup-in-batch"))
    q.processAllAvailable()
    mem.addData((1L, ts(3), "redelivery"), (3L, ts(4), "c"))
    q.processAllAvailable()
    println("[drive] survivors: " + spark.table("dd")
      .select("event_id").as[Long].collect().sorted.mkString(","))
    println("[drive] row count: " + spark.table("dd").count())
    q.stop()

    try {
      Streams.streamingDedup(mem.toDF().toDF("event_id", "ts", "payload"), Seq())
      println("[drive] GUARD MISSED")
    } catch {
      case e: IllegalArgumentException => println(s"[drive] empty-keys guard: ${e.getMessage}")
    }
    spark.stop()
  }
}
