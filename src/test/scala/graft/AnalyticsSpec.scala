package graft

import graft.operators.{CountMin, Funnel, Graph, Sampling}
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** Round-4 analytics operators: ordered funnel, fixed-point PageRank,
  * Count-Min sketch, mixture resampling, inverted index, bigram LM. */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  // --- funnel ---

  private def ev(rows: (Long, Long, String)*) =
    rows.toSeq.toDF("user_id", "ts_n", "event_type")
      .withColumn("ts", timestamp_micros(col("ts_n") * 1000000L))
      .withColumn("event_id", col("ts_n"))

  test("funnel counts stages only when completed IN ORDER") {
    // user 1: full path; user 2: click before view — click must not count
    // until a view follows it (here none does); user 3: never signs up
    val out = Funnel.funnel(
      ev((1L, 1L, "signup"), (1L, 2L, "view"), (1L, 3L, "click"),
        (2L, 1L, "signup"), (2L, 2L, "click"), (2L, 3L, "view"),
        (3L, 1L, "view"), (3L, 2L, "click")),
      "user_id", "ts", "event_type", "event_id",
      Seq("signup", "view", "click"))
      .select("user_id", "stages_completed").as[(Long, Int)].collect().toMap
    out shouldBe Map(1L -> 3, 2L -> 2) // user 3 absent (no stage 1)
  }

  test("funnel picks FIRST qualified ts per stage and is one exchange") {
    val df = Funnel.funnel(
      ev((1L, 1L, "signup"), (1L, 5L, "view"), (1L, 7L, "view")),
      "user_id", "ts", "event_type", "event_id", Seq("signup", "view"))
    df.select(unix_micros(col("view_ts"))).as[Long].head() shouldBe 5000000L
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString()).size shouldBe 1
  }

  test("a same-timestamp earlier-tiebreak prior stage is visible") {
    val out = Funnel.funnel(
      ev((1L, 1L, "signup"), (1L, 1L, "view")) // same ts, signup id < view id
        .withColumn("event_id",
          when(col("event_type") === "signup", 0L).otherwise(1L)),
      "user_id", "ts", "event_type", "event_id", Seq("signup", "view"))
      .select("stages_completed").as[Int].head()
    out shouldBe 2
  }

  // --- PageRank ---

  test("pageRank matches the hand-computed fixed point on a 3-cycle") {
    // cycle a->b->c->a, outdeg 1 everywhere: every node keeps scale rank
    // (0.15·1e6 + (1e6·17 div 20) = 150000 + 850000 = 1000000) each round
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val r = Graph.pageRank(e, "src", "dst", iterations = 3)
    r.select("rank").as[Long].collect().toSet shouldBe Set(1000000L)
    Graph.unpersist(r)
  }

  test("pageRank concentrates rank on the sink of a star, deterministically") {
    // 1..4 all point at 5; 5 points at 1
    val e = (1L to 4L).map(i => (i, 5L)).toDF("src", "dst")
      .unionByName(Seq((5L, 1L)).toDF("src", "dst"))
    val once = Graph.pageRank(e, "src", "dst", iterations = 5)
    val ranks = once.as[(Long, Long)].collect().toMap
    Graph.unpersist(once)
    ranks(5L) should be > ranks(2L)
    // identical on a different input partitioning
    val again = Graph.pageRank(e.repartition(7), "src", "dst", iterations = 5)
    again.as[(Long, Long)].collect().toMap shouldBe ranks
    Graph.unpersist(again)
  }

  // --- Count-Min ---

  test("count-min estimates are exact without collisions, >= truth always") {
    val items = Seq.fill(30)("a") ++ Seq.fill(10)("b") ++ Seq.fill(3)("c")
    val df = items.toDF("tok")
    val wide = CountMin.build(df, col("tok"), 4, 1024)
    CountMin.estimate(wide, df, col("tok"), 4, 1024)
      .as[(String, Long)].collect().toMap shouldBe
      Map("a" -> 30L, "b" -> 10L, "c" -> 3L)
    // adversarially narrow sketch: 2 buckets force collisions — estimates
    // may only ever OVERcount
    val narrow = CountMin.build(df, col("tok"), 2, 2)
    val est = CountMin.estimate(narrow, df, col("tok"), 2, 2)
      .as[(String, Long)].collect().toMap
    est("a") should be >= 30L
    est("b") should be >= 10L
    est("c") should be >= 3L
    // a candidate the stream never saw estimates 0 when its buckets are
    // untouched (absent counter row == 0, not a dropped row)
    val unseen = CountMin.estimate(wide, Seq("zzz-never").toDF("tok"),
      col("tok"), 4, 1024).as[(String, Long)].collect().toMap
    unseen("zzz-never") shouldBe 0L
  }

  test("count-min counters are partitioning-invariant and bounded by d*w") {
    val df = (1 to 500).map(i => s"t${i % 37}").toDF("tok")
    val a = CountMin.build(df, col("tok"), 3, 16)
      .as[(Int, Long, Long)].collect().toSet
    val b = CountMin.build(df.repartition(13), col("tok"), 3, 16)
      .as[(Int, Long, Long)].collect().toSet
    a shouldBe b
    a.size should be <= 3 * 16
  }

  // --- mixture resampling ---

  test("apportion: quotas sum to N, follow weights, deterministic ties") {
    val q = Sampling.apportion(Seq("a" -> 1L, "b" -> 1L, "c" -> 1L), 100L).toMap
    q.values.sum shouldBe 100L
    // 100/3: two groups get 33, the lexicographically-first tied gets 34
    q shouldBe Map("a" -> 34L, "b" -> 33L, "c" -> 33L)
    Sampling.apportion(Seq("x" -> 5L, "y" -> 2L, "z" -> 3L), 10L).toMap shouldBe
      Map("x" -> 5L, "y" -> 2L, "z" -> 3L)
  }

  test("mixtureSample hits quotas, caps at group size, drops other groups") {
    val docs = ((1 to 60).map(i => (i.toLong, "en")) ++
      (61 to 70).map(i => (i.toLong, "de")) ++
      (71 to 75).map(i => (i.toLong, "xx"))).toDF("id", "g")
    val out = Sampling.mixtureSample(docs, col("g"), col("id"),
      Seq("en" -> 3L, "de" -> 1L), totalN = 40L)
    val byLang = out.groupBy("g").count().as[(String, Long)].collect().toMap
    byLang("en") shouldBe 30L // quota 30 <= 60 available
    byLang("de") shouldBe 10L // quota 10 == available
    byLang.contains("xx") shouldBe false
    // deterministic: same rows regardless of partitioning
    val again = Sampling.mixtureSample(docs.repartition(9), col("g"), col("id"),
      Seq("en" -> 3L, "de" -> 1L), totalN = 40L)
    again.select("id").as[Long].collect().toSet shouldBe
      out.select("id").as[Long].collect().toSet
  }

  // --- inverted index + bigram LM ---

  test("invertedIndex: sorted postings, duplicate hits collapse, cap flags") {
    val docs = Seq((10L, "x y x"), (2L, "x z")).toDF("doc_id", "text")
    val idx = TextAnalysis.invertedIndex(docs, "doc_id", "text")
      .as[(String, Long, String, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    idx("x") shouldBe ("x", 2L, "2,10", false) // numeric sort, dup collapsed
    idx("y") shouldBe ("y", 1L, "10", false)
    val capped = TextAnalysis.invertedIndex(docs, "doc_id", "text",
      maxPostings = 1)
      .as[(String, Long, String, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    capped("x") shouldBe ("x", 2L, "2", true) // df stays true, list capped
  }

  // --- CDC apply ---

  test("cdc applyChanges: latest wins, deletes tombstone, re-inserts revive") {
    import graft.operators.Cdc
    val log = Seq(
      (1L, "a", 1L, "I"), (1L, "b", 2L, "U"),           // key 1 → b
      (2L, "x", 1L, "I"), (2L, null, 2L, "D"),           // key 2 → gone
      (3L, "y", 1L, "I"), (3L, null, 2L, "D"), (3L, "z", 3L, "I") // revived
    ).toDF("k", "v", "seq", "op")
    val out = Cdc.applyChanges(log, Seq("k"), "seq", "op")
      .as[(Long, String)].collect().toMap
    out shouldBe Map(1L -> "b", 3L -> "z")
    // single exchange on the key
    "Exchange hashpartitioning".r.findAllIn(
      Cdc.applyChanges(log, Seq("k"), "seq", "op")
        .queryExecution.executedPlan.toString()).size shouldBe 1
  }

  test("cdc applyChangesTo: target rows are the baseline under every change") {
    import graft.operators.Cdc
    val target = Seq((1L, "old"), (2L, "keep")).toDF("k", "v")
    val log = Seq((1L, "new", 1L, "U"), (3L, "add", 1L, "I")).toDF("k", "v", "seq", "op")
    Cdc.applyChangesTo(target, log, Seq("k"), "seq", "op")
      .as[(Long, String)].collect().toMap shouldBe
      Map(1L -> "new", 2L -> "keep", 3L -> "add")
  }

  // --- KMV set algebra ---

  test("kmvUnion equals the sketch of the unioned data; jaccard is exact " +
    "when sketches hold the full sets") {
    import graft.functions.Sketches
    val k = 64
    def sketchOf(xs: Seq[String]) = xs.toDF("v")
      .agg(Sketches.kmvSketch(Sketches.hash63(col("v")), k).as("sk"))
    val a = (1 to 30).map(i => s"x$i")
    val b = (21 to 50).map(i => s"x$i") // overlap 21..30 → J = 10/50
    val merged = sketchOf(a).select(col("sk").as("ska"))
      .crossJoin(sketchOf(b).select(col("sk").as("skb")))
    val direct = sketchOf(a ++ b).select(col("sk")).as[Seq[Long]].head()
    val viaUnion = merged
      .select(Sketches.kmvUnion(col("ska"), col("skb"), k)).as[Seq[Long]].head()
    viaUnion shouldBe direct
    merged.select(Sketches.kmvJaccard(col("ska"), col("skb"), k))
      .as[Double].head() shouldBe (10.0 / 50.0)
  }

  test("kmvUnionAll (codegen k-way merge) == folding kmvUnion, incl. sub-k and empty inputs") {
    import graft.functions.Sketches
    val k = 16
    def sketchOf(xs: Seq[String]) = xs.toDF("v")
      .agg(Sketches.kmvSketch(Sketches.hash63(col("v")), k).as("sk"))
    // three overlapping sets; c is tiny (sub-k) to hit the short-array arm
    val a = (1 to 40).map(i => s"x$i")
    val b = (30 to 70).map(i => s"x$i")
    val c = Seq("x5", "x99")
    val three = sketchOf(a).select(col("sk").as("a"))
      .crossJoin(sketchOf(b).select(col("sk").as("b")))
      .crossJoin(sketchOf(c).select(col("sk").as("c")))
      .select(array(col("a"), col("b"), col("c")).as("sks"))
    val folded = three.select(
      aggregate(col("sks"), array().cast("array<bigint>"),
        (acc, sk) => Sketches.kmvUnion(acc, sk, k))).as[Seq[Long]].head()
    val merged = three.select(Sketches.kmvUnionAll(col("sks"), k))
      .as[Seq[Long]].head()
    merged shouldBe folded
    merged shouldBe sketchOf(a ++ b ++ c).select(col("sk")).as[Seq[Long]].head()
    // an empty sketch array (no buckets in range) merges to the empty sketch
    spark.range(1).select(Sketches.kmvUnionAll(
      array().cast("array<array<bigint>>"), k)).as[Seq[Long]].head() shouldBe Nil
  }

  test("count-min counters maintained per micro-batch == the batch build " +
    "(linear-sketch mergeability over a real file stream)") {
    val sfDir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    val srcDir = tmpDir("cms_stream")
    spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(4).write.mode("overwrite").parquet(srcDir)
    def toks(df: org.apache.spark.sql.DataFrame) =
      df.select(explode(TextAnalysis.tokens(lower(col("text")))).as("tok"))
        .where(col("tok") =!= "")
    val sch = spark.read.parquet(srcDir).schema
    var acc: Option[org.apache.spark.sql.DataFrame] = None
    var batches = 0
    val q = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val c = CountMin.build(toks(df), col("tok"), 4, 64)
        acc = Some(acc.map(CountMin.mergeCounters(_, c)).getOrElse(c)
          .localCheckpoint())
        batches += 1
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    batches should be >= 2 // actually incremental, not one big batch
    val streamed = acc.get.as[(Int, Long, Long)].collect().toSet
    val direct = CountMin.build(toks(spark.read.parquet(srcDir)),
      col("tok"), 4, 64).as[(Int, Long, Long)].collect().toSet
    streamed shouldBe direct
  }

  test("sliding-KMV bucket sketches maintained per micro-batch == batch build, " +
    "and full reprocessing is a no-op (set-merge idempotency)") {
    import graft.functions.Sketches
    import graft.streaming.Streams
    val sfDir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$sfDir/events.parquet").exists())
    val k = 4096
    val srcDir = tmpDir("kmv_stream_src")
    spark.read.parquet(s"$sfDir/events.parquet")
      .repartition(3).write.mode("overwrite").parquet(srcDir)
    val sch = spark.read.parquet(srcDir).schema
    val statePath = tmpDir("kmv_stream_state") + "/buckets"
    // testdata events carry TIMESTAMP(NANOS) read as long — convert the
    // same way Queries.events does before handing to the operator
    def withTs(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        df.withColumn("ts", timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
      else df
    def run(checkpoint: String): Unit = {
      val q = Streams.slidingKmvStream(spark,
        withTs(spark.readStream.schema(sch).option("maxFilesPerTrigger", 1)
          .parquet(srcDir)),
        statePath, checkpoint, k, availableNow = true)
      try q.awaitTermination() finally q.stop()
    }
    run(tmpDir("kmv_stream_ckpt"))
    def estimates(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.select(col("bucket"), Sketches.kmvEstimate(col("sk"), k).as("est"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val streamed = estimates(graft.operators.Upsert.read(spark, statePath))
    // batch twin: one sketch per bucket straight over the whole table
    val direct = estimates(withTs(spark.read.parquet(srcDir))
      .select(graft.Queries.floorDiv(unix_micros(col("ts")), 3600000000L)
        .as("bucket"), col("user_id"))
      .groupBy("bucket")
      .agg(Sketches.kmvSketch(Sketches.hash63(col("user_id").cast("string")), k)
        .as("sk")))
    streamed shouldBe direct
    // reprocess EVERYTHING with a fresh checkpoint: the set merge must
    // absorb the redelivery without moving a single estimate
    run(tmpDir("kmv_stream_ckpt2"))
    estimates(graft.operators.Upsert.read(spark, statePath)) shouldBe streamed
  }

  test("stream-static dim enrichment over a real file stream == batch twin, " +
    "stream side never exchanges") {
    import graft.streaming.Streams
    val sfDir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$sfDir/events.parquet").exists())
    val dim = Seq(("view", 1), ("click", 2), ("purchase", 3), ("signup", 0),
      ("error", -1)).toDF("event_type", "stage_rank")
    val batchEvents = spark.read.parquet(s"$sfDir/events.parquet")
      .select("event_id", "event_type")
    val expected = Streams.enrichWithDim(batchEvents, dim, "event_type")
      .collect().map(_.toSeq).toSet
    // plan: broadcast join only — no hash exchange on the stream side
    "Exchange hashpartitioning".r.findAllIn(
      Streams.enrichWithDim(batchEvents, dim, "event_type")
        .queryExecution.executedPlan.toString()).size shouldBe 0
    val srcDir = tmpDir("enrich_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$srcDir/events.parquet"))
    val sch = spark.read.parquet(s"$sfDir/events.parquet").schema
    val streamed = Streams.enrichWithDim(
      spark.readStream.schema(sch).parquet(srcDir)
        .select("event_id", "event_type"),
      dim, "event_type")
    val q = streamed.writeStream.format("memory").queryName("enrich_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    spark.table("enrich_out").collect().map(_.toSeq).toSet shouldBe expected
  }

  test("bm25: term-frequency monotone, rare terms dominate, non-matchers absent") {
    val docs = Seq(
      (1L, "join join join pad pad pad pad pad"),
      (2L, "join pad pad pad pad pad pad pad"),
      (3L, "rare pad pad pad pad pad pad pad"),
      (4L, "pad pad pad pad pad pad pad pad")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25Scores(docs, "doc_id", "text",
      Seq("join", "rare")).as[(Long, Double, Int)].collect()
      .map(r => r._1 -> r).toMap
    out.contains(4L) shouldBe false // no query term → no row
    out(1L)._2 should be > out(2L)._2 // higher tf, same term → higher score
    out(3L)._2 should be > out(2L)._2 // df=1 'rare' outweighs df=2 'join'
    out(1L)._3 shouldBe 1
    // deterministic across partitionings (fixed-order term combine)
    TextAnalysis.bm25Scores(docs.repartition(5), "doc_id", "text",
      Seq("join", "rare")).as[(Long, Double, Int)].collect()
      .map(r => r._1 -> r).toMap shouldBe out
  }

  // --- histogram quantiles ---

  test("histogramQuantiles: interpolated values, error bounded by bin width") {
    import graft.operators.Profile
    // 1..100 uniform, 10 bins over [0, 100): exact P50=50.5, P90=90.1
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val out = Profile.histogramQuantiles(df, "v", 0.0, 100.0, 10,
        Seq(0.5, 0.9)).as[(Double, Double)].collect().toMap
    out(0.5) shouldBe 50.0 +- 10.0
    out(0.9) shouldBe 90.0 +- 10.0
    // degenerate single bin still answers
    Profile.histogramQuantiles(df, "v", 0.0, 100.0, 1, Seq(0.5))
      .count() shouldBe 1
  }

  test("corrRegression: recovers an exact linear fit, bit-stable across " +
    "partitionings") {
    import graft.operators.Profile
    // y = 2x + 3 exactly → corr 1, slope 2, intercept 3
    val exact = (1 to 50).map(i => ("g", i.toDouble, 2.0 * i + 3))
      .toDF("g", "x", "y")
    val fit = Profile.corrRegression(exact, "g", "x", "y")
      .select("corr", "slope", "intercept").as[(Double, Double, Double)].head()
    fit._1 shouldBe 1.0 +- 1e-9
    fit._2 shouldBe 2.0 +- 1e-9
    fit._3 shouldBe 3.0 +- 1e-9
    // anti-correlated leg + partitioning invariance (exact decimal sums)
    val noisy = (1 to 200).map(i => ("h", i.toDouble, -0.5 * i + 7.25))
      .toDF("g", "x", "y")
    val a = Profile.corrRegression(noisy, "g", "x", "y").collect()(0)
    val b = Profile.corrRegression(noisy.repartition(17), "g", "x", "y")
      .collect()(0)
    a shouldBe b
    a.getDouble(2) shouldBe -1.0 +- 1e-9
  }

  // --- vector sum aggregate ---

  test("vectorSum: element-wise, partitioning-invariant, loud on bad dim") {
    import graft.functions.VectorAgg
    val rows = Seq((1, Seq(1L, 2L, 3L)), (1, Seq(10L, 20L, 30L)),
      (2, Seq(5L, 5L, 5L))).toDF("g", "v")
    def run(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g").agg(VectorAgg.vectorSum(col("v"), 3).as("s"))
        .as[(Int, Seq[Long])].collect().toMap
    val expected = Map(1 -> Seq(11L, 22L, 33L), 2 -> Seq(5L, 5L, 5L))
    run(rows) shouldBe expected
    run(rows.repartition(7)) shouldBe expected
    val bad = intercept[Exception] {
      Seq((1, Seq(1L, 2L))).toDF("g", "v")
        .groupBy("g").agg(VectorAgg.vectorSum(col("v"), 3)).collect()
    }
    bad.getMessage should include("dim")
  }

  test("bigramLmScore: hand-checked fixed-point means") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val model = TextAnalysis.bigramModel(docs, "text")
    // c("a b")=2, c("a c")=1, prefix c1("a")=3
    model.where(col("pair") === "a b").select("c1").as[Long].head() shouldBe 3L
    val scores = TextAnalysis.bigramLmScore(docs, "doc_id", "text", model)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    scores(1L) shouldBe 666666L // (2*1e6) div 3
    scores(3L) shouldBe 333333L // (1*1e6) div 3
  }

  test("pageRankResumable: killed after round 2, resume is bit-identical to a straight run") {
    import graft.sources.Snapshots
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 1L), (5L, 1L))
      .toDF("src", "dst")
    def ranksOf(df: org.apache.spark.sql.DataFrame) =
      df.select("node", "rank").as[(Long, Long)].collect().toSet
    val straight = ranksOf(Graph.pageRank(e, "src", "dst", iterations = 5))

    val table = tmpDir("prstate") + "/ranks"
    // job dies at the round-2 boundary (state through round 2 is durable)…
    Graph.pageRankResumable(spark, e, table, iterations = 2)
    Snapshots.versions(spark, table).size shouldBe 2
    // …and the restarted job finishes rounds 3..5 from the committed state
    val resumed = ranksOf(
      Graph.pageRankResumable(spark, e, table, iterations = 5))
    resumed shouldBe straight // bit-identical longs, not approximately
    Snapshots.versions(spark, table).size shouldBe 5
  }

  test("connectedComponentsResumable: crash via maxIter, resume converges identically") {
    import graft.sources.Snapshots
    // a 7-node path needs ~6 propagation rounds; maxIter=2 DIES mid-job
    // (require throws) after durably committing rounds 1-2 — a real crash
    // path, not a simulated one
    val path = (1L to 6L).map(i => (i, i + 1)).toDF("id1", "id2")
    val straight = Graph.connectedComponents(path)
      .as[(Long, Long)].collect().toSet
    val table = tmpDir("ccstate") + "/labels"
    an[IllegalArgumentException] should be thrownBy
      Graph.connectedComponentsResumable(spark, path, table, maxIter = 2)
    Snapshots.versions(spark, table).size shouldBe 2
    val resumed = Graph.connectedComponentsResumable(spark, path, table)
      .as[(Long, Long)].collect().toSet
    resumed shouldBe straight
    // resuming a converged state is a metadata read, no new commits
    val v = Snapshots.versions(spark, table).size
    Graph.connectedComponentsResumable(spark, path, table)
      .as[(Long, Long)].collect().toSet shouldBe straight
    Snapshots.versions(spark, table).size shouldBe v
  }

  test("triangleCounts: hand-checked counts; hubs never enumerate wedges") {
    // K4 on {1,2,3,4} (4 triangles, 3 per node) plus a pendant 4-5 edge;
    // duplicate + reversed edges must collapse, self-loops drop
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 5L)).toDF("src", "dst")
    val out = Graph.triangleCounts(e).as[(Long, Long)].collect().toMap
    out shouldBe Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L) // node 5: none
  }

  test("triangleCounts: triangle set is orientation-independent (matches id-ordered count)") {
    // star + rim (wheel graph): hub 0 has degree 6, rim nodes 3 — the
    // degree orientation sends wedge work to the rim, counts stay exact
    val rim = (1L to 6L).map(i => (i, if (i == 6L) 1L else i + 1))
    val spokes = (1L to 6L).map(i => (0L, i))
    val e = (rim ++ spokes).toDF("src", "dst")
    val out = Graph.triangleCounts(e).as[(Long, Long)].collect().toMap
    out(0L) shouldBe 6L // hub is in every rim triangle
    (1L to 6L).foreach(i => out(i) shouldBe 2L)
  }

  test("triangleEstimate: p=1 degenerates to the exact count; sample is a hash-subset") {
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 5L)).toDF("src", "dst")
    // num=den → every edge kept, scale 1: the estimator IS triangleCounts
    val full = Graph.triangleEstimate(e, num = 1, den = 1)
      .as[(Long, Long, Long, Long)].collect().head
    full shouldBe ((7L, 7L, 4L, 4L)) // K4 = 4 triangles; 6 + pendant = 7 canonical edges
    // p=1/2: sampled edges a strict hash-subset, estimate = sampled * 8,
    // and the row is deterministic (hash coins, not RNG)
    val half1 = Graph.triangleEstimate(e, num = 1, den = 2)
      .as[(Long, Long, Long, Long)].collect().head
    val half2 = Graph.triangleEstimate(e, num = 1, den = 2)
      .as[(Long, Long, Long, Long)].collect().head
    half1 shouldBe half2
    half1._1 shouldBe 7L
    half1._2 should be <= 7L
    half1._4 shouldBe half1._3 * 8
  }

  test("triangleEstimate lands near exact on a dense fixture (DOULION accuracy)") {
    // K12: C(12,3) = 220 triangles, 66 edges — dense enough that a p=1/2
    // hash sample keeps the estimator in range (paper: variance shrinks
    // with triangle-rich graphs)
    val nodes = 1L to 12L
    val e = (for { a <- nodes; b <- nodes if a < b } yield (a, b)).toDF("src", "dst")
    val r = Graph.triangleEstimate(e, num = 1, den = 2)
      .as[(Long, Long, Long, Long)].collect().head
    r._1 shouldBe 66L
    // deterministic sample → fixed estimate; assert the realized accuracy
    // band rather than a tautology (exact = 220)
    r._4.toDouble shouldBe 220.0 +- 110.0
  }

  test("lastTouchAttribution: credits the preceding touch, direct when none") {
    import graft.operators.Funnel
    val out = Funnel.lastTouchAttribution(
      ev((1L, 1L, "view"), (1L, 2L, "purchase"), // view closes
        (1L, 3L, "click"), (1L, 4L, "purchase"), // click closes
        (2L, 1L, "purchase"), // nothing preceded → direct
        (2L, 2L, "purchase")) // a prior PURCHASE is not a touch → direct
        .withColumn("value", lit(10.0)),
      "user_id", "ts", "event_type", "event_id", "purchase", "value")
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    out shouldBe Map("view" -> ((1L, 10.0)), "click" -> ((1L, 10.0)),
      "direct" -> ((2L, 20.0)))
  }

  test("floorDiv floors negative epochs (pre-1970 cohort bucketing)") {
    // truncating division would put -1µs in day 0; floor puts it in day -1,
    // matching DuckDB's `//` and java.lang.Math.floorDiv
    val us = Seq(-1L, -86400000000L, -86400000001L, 0L, 86399999999L)
    val out = us.toDF("us")
      .select(col("us"), Queries.floorDiv(col("us"), 86400000000L).as("day"))
      .as[(Long, Long)].collect().toMap
    us.foreach { u =>
      out(u) shouldBe Math.floorDiv(u, 86400000000L)
    }
    out(-1L) shouldBe -1L
    out(-86400000001L) shouldBe -2L
  }

  test("bigramLmScore: out-of-corpus bigrams score 0 but count (canonical LEFT-join semantics)") {
    val train = Seq((1L, "a b")).toDF("doc_id", "text")
    val model = TextAnalysis.bigramModel(train, "text")
    // "a b" seen (pts=1e6), "b z" unseen (pts=0) → mean = 5e5 over 2 bigrams
    val out = TextAnalysis.bigramLmScore(
      Seq((9L, "a b z")).toDF("doc_id", "text"), "doc_id", "text", model)
      .as[(Long, Long, Long)].collect().head
    out shouldBe ((9L, 2L, 500000L))
  }

  test("cdc applyChanges: equal-seq tie resolves deterministically (delete loses to upsert)") {
    import graft.operators.Cdc
    val changes = Seq(
      (1L, 5L, "D", "gone"), (1L, 5L, "U", "kept"), // same seq, D vs U
      (2L, 1L, "I", "x"), (2L, 2L, "D", "y")).toDF("k", "seq", "op", "v")
    val out = Cdc.applyChanges(changes, Seq("k"), "seq", "op")
      .as[(Long, String)].collect().toMap
    out shouldBe Map(1L -> "kept") // U wins the tie; key 2 deleted
  }
}
