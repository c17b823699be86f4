package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewBucketSpec extends SparkSpec {
  import spark.implicits._

  private def skewed = (1 to 2000).map(i =>
    (if (i % 10 == 0) 7L else i.toLong % 50, i)).toDF("k", "v")
  private def dim = (0L until 50L).map(k => (k, s"name$k")).toDF("k", "name")

  test("salted join equals plain join") {
    val plain = skewed.join(dim, Seq("k"), "inner")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), saltFactor = 8)
      .collect().map(_.toSeq).toSet
    salted shouldBe plain
  }

  test("salted two-phase aggregation equals plain aggregation") {
    val plain = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedAgg(skewed, Seq("k"), 8,
      partial = Seq(count(lit(1)).as("pn"), sum($"v").as("ps")),
      merge = Seq(sum($"pn").as("n"), sum($"ps").as("s")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    salted shouldBe plain
  }

  test("hash samples are deterministic and nest by fraction") {
    val df = (1L to 2000L).map(i => (i, s"v$i")).toDF("id", "v")
    val s20a = graft.operators.Sampling.hashSample(df, $"id", 0.2)
      .select("id").as[Long].collect().toSet
    val s20b = graft.operators.Sampling.hashSample(df, $"id", 0.2)
      .select("id").as[Long].collect().toSet
    val s50 = graft.operators.Sampling.hashSample(df, $"id", 0.5)
      .select("id").as[Long].collect().toSet
    s20a shouldBe s20b                      // deterministic
    s20a.subsetOf(s50) shouldBe true        // nesting
    s20a.size.toDouble should be(400.0 +- 120.0) // ~20%
    s50.size.toDouble should be(1000.0 +- 180.0)
  }

  test("bucketed tables join without a shuffle exchange") {
    val left = (1L to 1000L).map(i => (i % 100, i)).toDF("k", "v")
    val right = (1L to 500L).map(i => (i % 100, s"r$i")).toDF("k", "name")
    left.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("bkt_left")
    right.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("bkt_right")
    try {
      // disable auto-broadcast so the co-located (bucketed) join is visible
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_left").join(spark.table("bkt_right"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      plan should not include "Exchange hashpartitioning"
      joined.count() shouldBe 5000L // 10 left × 5 right per key × 100 keys
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }
}
