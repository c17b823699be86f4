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

  test("sharded shuffle: total deterministic order, salt reshuffles, no global sort") {
    val df = (1L to 2000L).map(i => (i, s"doc $i body")).toDF("doc_id", "text")
    val a = graft.operators.Sampling.shardedShuffle(df, $"doc_id", "ep1", 8)
    val b = graft.operators.Sampling.shardedShuffle(df, $"doc_id", "ep1", 8)
    val rowsA = a.select("doc_id", "shard", "pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    rowsA.toSet shouldBe b.select("doc_id", "shard", "pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    // every row lands exactly once; positions are 1..n contiguous per shard
    rowsA.length shouldBe 2000
    rowsA.groupBy(_._2).foreach { case (_, rs) =>
      rs.map(_._3).sorted shouldBe (1 to rs.length).toArray
    }
    // a different epoch salt produces a genuinely different order
    val ep2 = graft.operators.Sampling.shardedShuffle(df, $"doc_id", "ep2", 8)
      .select("doc_id", "shard", "pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    ep2 should not be rowsA.toSet
    // scale shape: one hash exchange on shard, never a single global sort
    a.collect()
    val plan = a.queryExecution.executedPlan.toString()
    "Exchange hashpartitioning".r.findAllIn(
      plan.split("== Initial Plan ==").head).size shouldBe 1
    plan should not include "Exchange rangepartitioning"
  }

  test("token packing fills per-shard bins in order and respects the running budget") {
    val df = (1L to 300L).map(i => (i, Seq.fill(40)("tok").mkString(" ")))
      .toDF("doc_id", "text") // 40 tokens per doc
    val shuffled = graft.operators.Sampling.shardedShuffle(df, $"doc_id", "ep1", 4)
    val packed = graft.operators.Sampling.packByTokenBudget(
        shuffled, graft.text.TextAnalysis.tokenCount($"text"), budget = 100)
      .select("shard", "pos", "bin")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    // 40-token docs into 100-token windows: doc k (0-based, per shard)
    // starts at 40k tokens → bin = floor(40k/100) = 0,0,0,1,1,2,2,2,3...
    packed.foreach { case (_, pos, bin) =>
      bin shouldBe (40L * (pos - 1)) / 100
    }
    // bins are monotone in order within a shard
    packed.groupBy(_._1).foreach { case (_, rs) =>
      rs.sortBy(_._2).map(_._3).sliding(2).foreach {
        case Array(x, y) => y should be >= x
        case _ =>
      }
    }
  }

  test("packed sequences concatenate each bin's docs in shuffle order") {
    val df = (1L to 120L).map(i => (i, s"d$i w$i")).toDF("doc_id", "text")
    val shuffled = graft.operators.Sampling.shardedShuffle(df, $"doc_id", "ep1", 4)
    val packed = graft.operators.Sampling.packByTokenBudget(
      shuffled, graft.text.TextAnalysis.tokenCount($"text"), budget = 10)
    val seqs = graft.operators.Sampling.packedSequences(packed, "text")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> (r.getString(2), r.getLong(3)))
      .toMap
    // reference: group the assignment rows ourselves, concat by pos order
    val rows = packed.select("shard", "bin", "pos", "text")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getString(3)))
    rows.groupBy(r => (r._1, r._2)).foreach { case (key, rs) =>
      val expect = rs.sortBy(_._3).map(_._4).mkString(" ")
      seqs(key)._1 shouldBe expect
      seqs(key)._2 shouldBe rs.length.toLong
    }
    // every doc's text appears in exactly one sequence
    seqs.values.map(_._2).sum shouldBe 120L
  }

  test("AQE skew-join vs explicit salt: who handles the hot key when") {
    // hot fixture: key 7 owns ~90% of 40k fact rows; dim is 50 keys but
    // broadcast is disabled (the saltedJoin scaladoc case: dimension-sized
    // yet broadcast-ineligible)
    val hot = (1 to 40000).map(i =>
      (if (i % 10 != 0) 7L else i.toLong % 50, s"payload-$i")).toDF("k", "v")
    val dim = (0L until 50L).map(k => (k, s"name$k")).toDF("k", "name")
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // scale AQE's 256 MB-class thresholds down to fixture size so the
      // same decision logic that runs at 100 TB runs here
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16384")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16384")

      // (a) bare SMJ: AQE's skew-join DOES split the hot partition —
      // no manual salt needed
      val bare = hot.join(dim.hint("merge"), Seq("k"))
      bare.queryExecution.toRdd.foreach(_ => ())
      val barePlan = bare.queryExecution.executedPlan.toString()
        .split("== Initial Plan ==").head
      info("bare plan:\n" + barePlan)
      withClue(barePlan) { barePlan should include("skewed") }

      // (b) the same join feeding a groupBy on the join key: the join
      // output's hash partitioning is REQUIRED downstream, so AQE declines
      // to split (splitting duplicates right-side rows across splits of
      // one key) — the case where the explicit salt remains necessary
      val chained = hot.join(dim.hint("merge"), Seq("k"))
        .groupBy("k").agg(count(lit(1)).as("n"))
      chained.queryExecution.toRdd.foreach(_ => ())
      val chainedPlan = chained.queryExecution.executedPlan.toString()
        .split("== Initial Plan ==").head
      info("chained plan:\n" + chainedPlan)
      withClue(chainedPlan) { chainedPlan should not include "skewed" }

      // the salted rewrite handles exactly that case, identically
      val plainRows = chained.collect().map(_.toSeq).toSet
      val salted = Skew.saltedJoin(hot, dim, Seq("k"), saltFactor = 8)
        .groupBy("k").agg(count(lit(1)).as("n"))
      salted.collect().map(_.toSeq).toSet shouldBe plainRows
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
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
