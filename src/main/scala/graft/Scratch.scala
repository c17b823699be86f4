package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.pipeline.{BronzeToSilver, SilverToGold}

/** Throwaway drive harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // a corpus whose articles have NO comments: comments tables never materialize
    val root = Files.createTempDirectory("bronzeNc").toString
    val wh = Files.createTempDirectory("silverNc").toString
    val gold = Files.createTempDirectory("goldNc").toString
    val p = Paths.get(root, "vnexpress/topicA/2025/10/a.json")
    Files.createDirectories(p.getParent)
    Files.writeString(p, (1 to 100).map { i =>
      s"""{"title":"T$i","url":"https://e.vn/n$i","author":"au${i % 7}","topic":"x","sub_topic":null,"publish_date":"${1760054400L + i}","description":null,"main_content":"alpha beta gamma","keywords":["k${i % 5}"],"references":[],"comment_count":0,"top_comments":[],"ingested_at":null,"year":2025,"month":10,"day":10}"""
    }.mkString("\n"))

    BronzeToSilver.runBatch(spark, root, wh)
    println(s"[drive] silver tables materialized: " +
      graft.sources.FsUtils.listSubdirs(spark, wh).sorted.mkString(","))
    SilverToGold.run(spark, wh, gold)
    println(s"[drive] gold tables: " +
      graft.sources.FsUtils.listSubdirs(spark, gold).sorted.mkString(","))
    println(s"[drive] fact rows: " +
      spark.read.parquet(s"$gold/fact_article_publication").count())
    println(s"[drive] dim_interaction_type (UNKNOWN only): " +
      spark.read.parquet(s"$gold/dim_interaction_type").collect().mkString(";"))

    // schema-compat probe: declared silver schemas == what BronzeToSilver wrote
    graft.core.Schemas.silverSchemas.foreach { case (name, declared) =>
      if (graft.operators.Upsert.tableExists(spark, s"$wh/$name")) {
        val written = spark.read.parquet(s"$wh/$name").schema
        val d = declared.map(f => (f.name, f.dataType)).toSet
        val w = written.map(f => (f.name, f.dataType)).toSet
        if (d != w) println(s"[drive] SCHEMA MISMATCH $name: declared=$d written=$w")
        else println(s"[drive] schema ok: $name")
      } else println(s"[drive] not materialized (fallback path): $name")
    }
    spark.stop()
  }
}
