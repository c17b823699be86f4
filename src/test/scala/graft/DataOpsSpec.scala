package graft

import org.apache.spark.sql.functions._

import graft.operators.{Expectations, PartialAgg, Profile, Sampling}

/** Round-5 data operators: expectations engine, incremental partial
  * aggregation, distributed prefix sums, systematic weighted resampling,
  * MAD outliers. */
class DataOpsSpec extends SparkSpec {
  import spark.implicits._

  private def t001(name: String) =
    spark.read.parquet(s"/root/testdata/sf0.001/$name.parquet")

  // --- expectations ---

  private def ordersLike = Seq(
    (1L, Option(10L), "O", 50.0),
    (2L, Option(11L), "F", -1.0), // range violation
    (3L, None, "O", 10.0), // null custkey
    (3L, Option(10L), "X", 20.0), // dup key + bad status
    (4L, Option(99L), "P", 30.0) // dangling FK
  ).toDF("k", "ck", "status", "price")

  test("expectations: each rule counts its own violations") {
    import Expectations._
    val ref = Seq(10L, 11L).toDF("ck")
    val out = check(ordersLike, Seq(
      NotNull("ck"),
      AcceptedValues("status", Seq("O", "F", "P")),
      InRange("price", 0.0, 100.0),
      Satisfies("positive_key", col("k") > 0),
      UniqueKey(Seq("k")),
      RefIntegrity("ck", ref, "ck")))
      .select("rule", "violations", "passed")
      .as[(String, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    out shouldBe Map(
      "not_null(ck)" -> ((1L, false)),
      "accepted_values(status)" -> ((1L, false)),
      "in_range(price)" -> ((1L, false)),
      "satisfies(positive_key)" -> ((0L, true)),
      "unique(k)" -> ((1L, false)),
      "ref_integrity(ck)" -> ((1L, false)))
  }

  test("expectations: row-local rules share ONE scan") {
    import Expectations._
    val plan = check(ordersLike, Seq(NotNull("ck"), InRange("price", 0, 100),
      AcceptedValues("status", Seq("O")), Satisfies("pk", col("k") > 0)))
      .queryExecution.optimizedPlan.toString()
    // one LocalRelation/scan leaf, not one per rule
    "LocalRelation".r.findAllIn(plan).size shouldBe 1
  }

  // --- incremental partial aggregation ---

  test("partialAgg: merge(partials) equals direct recompute, bit-for-bit") {
    val df = t001("lineitem")
    val daily = PartialAgg.partials(df,
      Seq(to_date(col("l_shipdate")).as("d")), col("l_extendedprice"))
    val merged = PartialAgg.merge(daily,
        Seq((year(col("d")) * 100 + month(col("d"))).as("ym")))
      .select(col("ym"), col("n"), col("v_sum"), col("v_min"), col("v_max"),
        col("v_mean"))
      .collect().map(_.toSeq).toSet
    val direct = df.groupBy((year(col("l_shipdate")) * 100 +
        month(col("l_shipdate"))).as("ym"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast("decimal(28,10)")).as("v_sum"),
        min(col("l_extendedprice").cast("double")).as("v_min"),
        max(col("l_extendedprice").cast("double")).as("v_max"))
      .withColumn("v_mean",
        col("v_sum").cast("double") / col("n").cast("double"))
      .collect().map(_.toSeq).toSet
    merged shouldBe direct
  }

  test("partialAgg: states merge associatively (two half-merges == one)") {
    val df = t001("orders")
    val parts = PartialAgg.partials(df,
      Seq(col("o_orderstatus"), (col("o_orderkey") % 2).as("half")),
      col("o_totalprice"))
    val oneShot = PartialAgg.merge(parts, Seq(col("o_orderstatus")))
    val staged = PartialAgg.merge(
      PartialAgg.merge(parts, Seq(col("o_orderstatus"), col("half")))
        .drop("v_mean"),
      Seq(col("o_orderstatus")))
    oneShot.collect().map(_.toSeq).toSet shouldBe
      staged.collect().map(_.toSeq).toSet
  }

  // --- prefix sum + systematic resampling ---

  test("prefixSum: intervals tile [0, W) exactly, matching a global sort cumsum") {
    val df = (1L to 97L).map(i => (i, i % 7 + 1)).toDF("k", "w")
    val out = Sampling.prefixSum(df, "k", "w", shards = 5)
      .as[(Long, Long, Long, Long)].collect() // (k, weight, lo, hi)
    out.length shouldBe 97
    val total = (1L to 97L).map(_ % 7 + 1).sum
    out.map(_._4).max shouldBe total
    // intervals are disjoint and cover [0, W): sorted by lo, each hi
    // equals the next lo
    val sorted = out.sortBy(_._3)
    sorted.head._3 shouldBe 0L
    sorted.sliding(2).foreach {
      case Array(a, b) => a._4 shouldBe b._3
      case _ =>
    }
    // every width matches its weight
    out.foreach { case (k, w, lo, hi) => (hi - lo) shouldBe w }
  }

  test("systematic resampling: pick counts are floor/ceil of k*w/W; k picks total") {
    val df = Seq((1L, 1L), (2L, 10L), (3L, 100L), (4L, 889L)).toDF("k", "w")
    val out = Sampling.systematicWeightedSample(df, "k", "w", k = 100)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    out.values.sum shouldBe 100 // exactly k picks, always
    // W = 1000: expected picks = k*w/W = w/10
    out.getOrElse(1L, 0L) should be <= 1L
    out(3L) should (be >= 9L and be <= 11L)
    out(4L) should (be >= 88L and be <= 90L)
  }

  test("systematic resampling is partitioning-invariant") {
    val df = (1L to 200L).map(i => (i, i)).toDF("k", "w")
    val a = Sampling.systematicWeightedSample(df, "k", "w", 37)
      .collect().map(_.toSeq).toSet
    val b = Sampling.systematicWeightedSample(df.repartition(13), "k", "w", 37)
      .collect().map(_.toSeq).toSet
    a shouldBe b
  }

  test("systematic resampling: closed-form j-range ≡ explicit positions join") {
    // the r15 rewrite computes n_picks row-locally from [lo, hi) instead
    // of joining k exploded positions; replay the old join here and pin
    // row-for-row equality on an awkward weight mix (1s, a giant, primes)
    val rows = Seq((1L, 1L), (2L, 1L), (3L, 997L), (4L, 13L), (5L, 2L),
      (6L, 400L), (7L, 86L))
    for (k <- Seq(1, 2, 7, 101)) {
      val df = rows.toDF("k", "w")
      val c = Sampling.prefixSum(df, "k", "w")
      val positions = c.agg(max(col("hi")).as("__W"))
        .select(explode(sequence(lit(0L), lit(k - 1L))).as("__j"), col("__W"))
        .select(expr(s"(2*__j + 1) * __W div ${2L * k}").as("__pos"))
      val expected = c.join(broadcast(positions),
          col("__pos") >= col("lo") && col("__pos") < col("hi"))
        .groupBy(col("k"), col("weight"))
        .agg(count(lit(1)).as("n_picks"))
        .collect().map(_.toSeq).toSet
      val got = Sampling.systematicWeightedSample(df, "k", "w", k)
        .collect().map(_.toSeq).toSet
      withClue(s"k=$k: ") { got shouldBe expected }
    }
  }

  // --- bloom prefilter ---

  test("bloomPrefilter: no false negatives ever; passed set is deterministic") {
    import graft.operators.BloomFilter
    val build = (1L to 50L).map(i => i * 7).toDF("k")
    val probe = (1L to 1000L).toDF("k")
    val filter = BloomFilter.build(build, col("k"), m = 256, k = 2)
    val passed = BloomFilter.prefilter(probe, col("k"), filter, m = 256, k = 2)
      .as[Long].collect().toSet
    // every true member passes
    (1L to 50L).map(_ * 7).filter(_ <= 1000).foreach(m => passed should contain(m))
    // deterministic: a second build+probe passes the identical set
    val again = BloomFilter.prefilter(probe, col("k"),
      BloomFilter.build(build, col("k"), m = 256, k = 2), m = 256, k = 2)
      .as[Long].collect().toSet
    again shouldBe passed
    // and at m=256 with 50 keys the filter actually filters
    passed.size should be < 1000
  }

  test("bloomPrefilter pushes to the probe scan: no shuffle, no real join") {
    import graft.operators.BloomFilter
    val dir = tmpDir("bloomp")
    (1L to 100L).toDF("k").write.parquet(s"$dir/t")
    val probe = spark.read.parquet(s"$dir/t")
    val filter = BloomFilter.build((1L to 5L).toDF("k"), col("k"))
    val plan = BloomFilter.prefilter(probe, col("k"), filter)
      .queryExecution.executedPlan.toString()
    "Exchange hashpartitioning".r.findAllIn(plan).size shouldBe 0
  }

  // --- streaming CDC snapshot maintenance ---

  test("applyChangesStream maintains the snapshot across micro-batches == batch fold") {
    import graft.operators.Cdc
    import org.apache.spark.sql.types._
    val chDir = tmpDir("cdc_stream")
    val sch = StructType(Seq(StructField("k", LongType),
      StructField("seq", LongType), StructField("op", StringType),
      StructField("v", StringType)))
    def put(name: String, rows: Seq[(Long, Long, String, String)]): Unit =
      rows.toDF("k", "seq", "op", "v").repartition(1)
        .write.mode("overwrite").parquet(s"$chDir/$name")
    // batch 1: inserts; batch 2: update k=1, delete k=2, insert k=3
    put("b1", Seq((1L, 1L, "I", "a"), (2L, 2L, "I", "b")))
    val table = tmpDir("cdc_table") + "/t"
    val ckpt = tmpDir("cdc_ckpt")
    def drain(): Unit = {
      val q = Cdc.applyChangesStream(spark,
        spark.readStream.schema(sch)
          .option("maxFilesPerTrigger", 1).option("recursiveFileLookup", "true")
          .parquet(chDir),
        table, Seq("k"), "seq", "op", ckpt, availableNow = true)
      try q.awaitTermination() finally q.stop()
    }
    drain()
    graft.operators.Upsert.read(spark, table).as[(Long, String)].collect().toMap shouldBe
      Map(1L -> "a", 2L -> "b")
    put("b2", Seq((1L, 3L, "U", "a2"), (2L, 4L, "D", null),
      (3L, 5L, "I", "c")))
    drain() // checkpoint: only the NEW file is applied
    val finalState = graft.operators.Upsert.read(spark, table)
      .as[(Long, String)].collect().toMap
    finalState shouldBe Map(1L -> "a2", 3L -> "c")
    // equals the one-shot batch fold of the full changelog
    val batchFold = Cdc.applyChanges(
      spark.read.option("recursiveFileLookup", "true").parquet(chDir),
      Seq("k"), "seq", "op")
      .as[(Long, String)].collect().toMap
    finalState shouldBe batchFold
  }

  // --- streaming expectations gate ---

  test("checkStream appends a per-batch rule report to the audit trail") {
    import graft.operators.Expectations._
    import org.apache.spark.sql.types._
    val srcDir = tmpDir("exp_stream")
    val sch = StructType(Seq(StructField("k", LongType),
      StructField("v", StringType)))
    def put(name: String, rows: Seq[(Long, String)]): Unit =
      rows.toDF("k", "v").repartition(1)
        .write.mode("overwrite").parquet(s"$srcDir/$name")
    put("b1", Seq((1L, "a"), (2L, null))) // one null violation
    put("b2", Seq((3L, "c"), (4L, "d"), (4L, "e"))) // one dup violation
    val audit = tmpDir("exp_audit") + "/report"
    val q = checkStream(
      spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1).option("recursiveFileLookup", "true")
        .parquet(srcDir),
      Seq(NotNull("v"), UniqueKey(Seq("k"))),
      audit, tmpDir("exp_ckpt"), availableNow = true)
    try q.awaitTermination() finally q.stop()
    val report = spark.read.parquet(audit)
      .select("batch_id", "rule", "violations")
      .as[(Long, String, Long)].collect().toSet
    report.size shouldBe 4 // 2 batches x 2 rules
    report.map { case (_, r, v) => (r, v) } shouldBe Set(
      ("not_null(v)", 1L), ("not_null(v)", 0L),
      ("unique(k)", 0L), ("unique(k)", 1L))
  }

  // --- gap fill ---

  test("gapFill: linear interpolation between observations, carry at edges") {
    import graft.operators.GapFill
    val df = Seq((1L, 1L, 10.0), (1L, 3L, 30.0), (1L, 6L, 0.0),
      (2L, 5L, 7.0)).toDF("k", "day", "v")
    val out = GapFill.fill(df, "k", "day", "v")
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    out((1L, 1L)) shouldBe ((10.0, true))
    out((1L, 2L)) shouldBe ((20.0, false)) // 10 + (30-10)·1/2
    out((1L, 3L)) shouldBe ((30.0, true))
    out((1L, 4L)) shouldBe ((20.0, false)) // 30 + (0-30)·1/3
    out((1L, 5L)) shouldBe ((10.0, false)) // 30 + (0-30)·2/3
    out((1L, 6L)) shouldBe ((0.0, true))
    out((2L, 5L)) shouldBe ((7.0, true)) // single observation: spine of 1
    out.size shouldBe 7
  }

  // --- z-score outliers ---

  test("zscoreOutlierCounts: hand-checked mean/std and outlier flagging") {
    import graft.operators.Profile
    // 9 points at 10 and one at 110: mean 20, var = (9·100 + 8100)/10 =
    // 900, std 30 → only 110 is beyond 3·30 = 90 from the mean? |110-20|
    // = 90, not > 90 → 0 outliers at k=3; at k=2 (>60) → 1
    val df = (Seq.fill(9)(10.0) :+ 110.0).map(("g", _)).toDF("g", "v")
    val strict = Profile.zscoreOutlierCounts(df, "g", "v", k = 3.0)
      .as[(String, Long, Double, Double, Long)].collect().head
    strict shouldBe (("g", 10L, 20.0, 30.0, 0L))
    val loose = Profile.zscoreOutlierCounts(df, "g", "v", k = 2.0)
      .as[(String, Long, Double, Double, Long)].collect().head._5
    loose shouldBe 1L
  }

  // --- grouped histogram quantiles ---

  test("histogramQuantilesBy: per-group interpolated quantiles within bin error") {
    import graft.operators.Profile
    val df = ((0 until 100).map(i => ("a", i.toDouble)) ++
      (0 until 50).map(i => ("b", (i * 2).toDouble))).toDF("g", "v")
    val out = Profile.histogramQuantilesBy(df, "g", "v", 0.0, 100.0,
        bins = 10, qs = Seq(0.5))
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    out("a") shouldBe 50.0 +- 10.0
    out("b") shouldBe 50.0 +- 10.0
  }

  // --- distribution drift ---

  test("histogramDrift: identical corpora → 0; disjoint ranges → 1; asymmetric shift detected") {
    import graft.operators.Profile
    val a = (1 to 100).map(_.toDouble % 50).map(("x", _)).toDF("g", "v")
    val same = Profile.histogramDrift(a, a, "v", 0.0, 100.0, 10)
      .select("tv_distance").as[Double].head()
    same shouldBe 0.0
    val lo = (1 to 80).map(_ => 10.0).toDF("v")
    val hi = (1 to 40).map(_ => 90.0).toDF("v")
    val disjoint = Profile.histogramDrift(lo, hi, "v", 0.0, 100.0, 10)
      .as[(Long, Long, Double, Int, Double)].collect().head
    disjoint._1 shouldBe 80L
    disjoint._2 shouldBe 40L
    disjoint._3 shouldBe 1.0 // total variation of disjoint masses
    // both occupied bins carry the full gap; ties break to the lower bin
    disjoint._4 shouldBe 1
    disjoint._5 shouldBe 1.0 // |p_ref − p_cand| in the worst bin
  }

  test("histogramDriftWithin ≡ histogramDrift(ref, ref.where(pred))") {
    import graft.operators.Profile
    import org.apache.spark.sql.functions.col
    val a = (1 to 997).map(i => ((i * 7 % 100).toDouble, i % 3 == 0))
      .toDF("v", "en")
    val two = Profile.histogramDrift(a, a.where(col("en")),
      "v", 0.0, 100.0, 10).collect().head
    val one = Profile.histogramDriftWithin(a, col("en"),
      "v", 0.0, 100.0, 10).collect().head
    one shouldBe two
  }

  test("histogramDrift is partitioning-invariant (exact integer path)") {
    import graft.operators.Profile
    val a = (1 to 997).map(i => (i * 7 % 100).toDouble).toDF("v")
    val b = (1 to 500).map(i => (i * 13 % 90).toDouble).toDF("v")
    val one = Profile.histogramDrift(a, b, "v", 0.0, 100.0, 10).collect().head
    val two = Profile.histogramDrift(a.repartition(17), b.repartition(3),
      "v", 0.0, 100.0, 10).collect().head
    one shouldBe two
  }

  // --- table stats ---

  test("tableStats: exact counts/min/max; KMV ndv exact below k") {
    import graft.operators.Profile
    val df = Seq((1L, "a"), (2L, "b"), (3L, null), (4L, "a"), (4L, "a"))
      .toDF("id", "s")
    val out = Profile.tableStats(df, numericCols = Seq("id"),
        stringCols = Seq("s"))
      .as[(String, Long, Long, Option[Double], Option[Double], Double)]
      .collect().map(r => r._1 -> r).toMap
    out("id") shouldBe (("id", 5L, 0L, Some(1.0), Some(4.0), 4.0))
    out("s") shouldBe (("s", 4L, 1L, None, None, 2.0)) // a, b distinct; null skipped
  }

  // --- exact set-similarity join ---

  test("setSimJoin: prefix filtering finds EXACTLY the brute-force pair set") {
    import graft.dedup.Dedup
    val docs = t001("documents").where(col("doc_id") < 200)
    val viaPrefix = Dedup.setSimJoin(docs)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // brute force: every pair, exact verify at the same rational threshold
    val all = docs.select(col("doc_id").as("id1"))
      .join(docs.select(col("doc_id").as("id2")), col("id1") < col("id2"))
    val brute = Dedup.jaccardVerify(docs, all)
      .where(col("jaccard") >= 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    viaPrefix shouldBe brute
    viaPrefix should not be empty // the corpus has near-dups by construction
  }

  // --- vocabulary + token ids ---

  test("vocabulary ranks by frequency with deterministic ties; encode maps OOV to 0") {
    import graft.text.TextAnalysis
    val docs = Seq((1L, "b b b a a c"), (2L, "a b z")).toDF("doc_id", "text")
    // counts: b=4, a=3, c=1, z=1 → ids: b=1, a=2, c=3 (c before z on tie)
    val v = TextAnalysis.vocabulary(docs, "text", size = 3)
      .as[(String, Int)].collect().toMap
    v shouldBe Map("b" -> 1, "a" -> 2, "c" -> 3)
    val enc = TextAnalysis.encodeIds(docs, "doc_id", "text",
        TestSpark.spark.createDataFrame(
          v.toSeq.map(kv => (kv._1, kv._2))).toDF("tok", "id"))
      .as[(Long, Seq[Int], Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    enc(1L) shouldBe ((Seq(1, 1, 1, 2, 2, 3), 0L))
    enc(2L) shouldBe ((Seq(2, 1, 0), 1L)) // z is OOV → 0, counted
  }

  // --- MAD outliers ---

  test("madOutlierCounts: hand-checked median/MAD and outlier count") {
    val df = (Seq.fill(5)(10.0) ++ Seq(9.0, 11.0, 1000.0))
      .map(("g", _)).toDF("g", "v")
    // sorted: 9,10,10,10,10,10,11,1000 → median 10; |dev|: 0×5,1,1,990
    // → MAD 0 is wrong (sorted devs: 0,0,0,0,0,1,1,990 → median 0)… with
    // MAD 0 every off-median point is an outlier: 9, 11, 1000 → 3
    val out = Profile.madOutlierCounts(df, "g", "v", k = 3.0)
      .as[(String, Long, Double, Double, Long)].collect().head
    out shouldBe (("g", 8L, 10.0, 0.0, 3L))
  }
}
