package graft

import org.apache.spark.sql.SparkSession

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
    val dir = "/root/testdata/sf0.01"
    val out = "/tmp/graft_scratch_out"
    val only = Seq("q177_fast_append", "q170_equality_deletes", "q175_metadata_count", "q176_stats_pruned_read", "q163_manifested_merge", "q164_partition_timetravel", "q165_changelog", "q166_wap_merge", "q173_drop_partitions", "q174_tagged_read")
    new java.io.File(out).mkdirs()
    only.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).coalesce(1)
        .write.mode("overwrite").parquet(s"$out/$name")
      println(f"[t] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val oracles = SparkEntry.oracleSql.filter(kv => only.contains(kv._1))
    val json = oracles.map { case (k, v) =>
      s""""$k": ${org.apache.spark.sql.catalyst.util.StringUtils.escapeLikeRegex("", ' ') != null}"""
    }
    // write oracle_sql.json via a tiny manual JSON encoder
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\t' => "\\t"; case '\r' => "\\r"; case c => c.toString
    }
    val body = oracles.map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
      .mkString("{", ", ", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$out/oracle_sql.json"),
      body.getBytes("UTF-8"))
    spark.stop()
  }
}
