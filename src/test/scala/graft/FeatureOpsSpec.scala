package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Hand-checked cases for the feature-engineering batch: recency-decayed
  * value, sentence-level quality metrics, containment join, class-balanced
  * resampling, and Markov transition matrices. */
class FeatureOpsSpec extends SparkSpec {
  import spark.implicits._

  test("decayed value halves per day and is partitioning-invariant") {
    val ts = (d: Int) => java.sql.Timestamp.valueOf(f"2026-01-${d}%02d 12:00:00")
    // one user: 10.0 today (weight 2^20), 10.0 yesterday (2^19) →
    // score = 10 * (2^20 + 2^19) / (2^20 + 2^19) = 10 exactly
    val ev = Seq((1L, ts(2), 7L, 10.0), (2L, ts(1), 7L, 10.0))
      .toDF("event_id", "ts", "user_id", "value")
    def score(df: org.apache.spark.sql.DataFrame): Double = {
      val anchor = df.agg(max(to_date(col("ts"))).as("anchor_d"))
      df.crossJoin(broadcast(anchor))
        .withColumn("age", least(datediff(col("anchor_d"), to_date(col("ts"))), lit(20)))
        .withColumn("wt", expr("shiftleft(CAST(1 AS BIGINT), 20 - age)"))
        .withColumn("contrib", floor(col("value") * 1e6).cast("long") * col("wt"))
        .groupBy("user_id")
        .agg(sum(col("contrib").cast("decimal(38,0)")).as("sc"),
          sum(col("wt").cast("decimal(38,0)")).as("sw"))
        .select((col("sc").cast("double") / col("sw").cast("double") / 1e6))
        .as[Double].collect()(0)
    }
    score(ev) shouldBe 10.0
    score(ev.repartition(7)) shouldBe 10.0
    // mixed values: (20*2^20 + 10*2^19) / (2^20 + 2^19) = 50/3 — check the
    // exact rational both ways
    val ev2 = Seq((1L, ts(2), 7L, 20.0), (2L, ts(1), 7L, 10.0))
      .toDF("event_id", "ts", "user_id", "value")
    score(ev2) shouldBe (20e6 * (1L << 20) + 10e6 * (1L << 19)) /
      ((1L << 20) + (1L << 19)).toDouble / 1e6
  }

  test("sentence stats: split, word counts, and short-sentence fraction") {
    val text = "One two three. Four five! Six?? Seven eight nine ten"
    val sents = filter(
      transform(split(col("text"), "[.!?]+"), x => trim(x)), x => x =!= lit(""))
    val out = Seq((1L, text)).toDF("doc_id", "text")
      .select(transform(sents, sn =>
        org.apache.spark.sql.functions.size(split(sn, "\\s+"))).as("wc"))
      .select(org.apache.spark.sql.functions.size(col("wc")).as("n"),
        aggregate(col("wc"), lit(0L), (a, x) => a + x).as("words"),
        array_max(col("wc")).as("mx"),
        org.apache.spark.sql.functions.size(filter(col("wc"), x => x < 4)).as("short"))
      .collect()(0)
    out.getInt(0) shouldBe 4       // "Six??" double punctuation = one split
    out.getLong(1) shouldBe 10L
    out.getInt(2) shouldBe 4
    out.getInt(3) shouldBe 3       // 3-, 2-, 1-word sentences are short
  }

  test("containment finds the embedded-page pattern symmetric Jaccard misses") {
    val small = "alpha beta gamma delta epsilon zeta"
    val big = small + " " + (1 to 40).map(i => s"filler$i").mkString(" ")
    val docs = Seq((1L, small), (2L, big)).toDF("doc_id", "text")
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
    val row = sh.select(col("doc_id").as("id1"), col("sh").as("sh1"))
      .join(sh.select(col("doc_id").as("id2"), col("sh").as("sh2")),
        col("id1") < col("id2"))
      .withColumn("n_common",
        org.apache.spark.sql.functions.size(array_intersect(col("sh1"), col("sh2"))).cast("bigint"))
      .select(
        (col("n_common").cast("double") /
          org.apache.spark.sql.functions.size(col("sh1"))).as("cont_1"),
        (col("n_common").cast("double") /
          org.apache.spark.sql.functions.size(col("sh2"))).as("cont_2"))
      .collect()(0)
    row.getDouble(0) shouldBe 1.0 // every shingle of the small doc is in the big
    row.getDouble(1) should be < 0.2
  }

  test("label balance equalizes every class to the minority count, deterministically") {
    import graft.text.TextAnalysis
    val emb = ((1 to 10).map(i => (i.toLong, 0)) ++ (11 to 14).map(i => (i.toLong, 1)) ++
      (15 to 21).map(i => (i.toLong, 2))).toDF("vec_id", "label")
    def balanced(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int)] = {
      val minc = df.groupBy("label").agg(count(lit(1)).as("n")).agg(min("n").as("min_n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("label").orderBy(col("bucket"), col("vec_id"))
      df.withColumn("bucket",
          pmod(TextAnalysis.portableHash(col("vec_id").cast("string")), lit(10000L)))
        .withColumn("rn", row_number().over(w))
        .crossJoin(broadcast(minc))
        .where(col("rn") <= col("min_n"))
        .select("vec_id", "label").as[(Long, Int)].collect().toSeq.sorted
    }
    val out = balanced(emb)
    out.groupBy(_._2).view.mapValues(_.size).toMap shouldBe Map(0 -> 4, 1 -> 4, 2 -> 4)
    balanced(emb.repartition(5)) shouldBe out // hash pick, not partition order
  }

  test("chi-square cells are zero under independence and positive under association") {
    def chi2(rows: Seq[(String, String)]): Map[(String, String), Double] = {
      val cells = rows.toDF("lang", "source")
        .groupBy("lang", "source").agg(count(lit(1)).as("o"))
      val byLang = org.apache.spark.sql.expressions.Window.partitionBy("lang")
      val bySource = org.apache.spark.sql.expressions.Window.partitionBy("source")
      val all = org.apache.spark.sql.expressions.Window.partitionBy()
      cells
        .withColumn("row_n", sum("o").over(byLang))
        .withColumn("col_n", sum("o").over(bySource))
        .withColumn("tot", sum("o").over(all))
        .withColumn("dev_d",
          (col("o") * col("tot") - col("row_n") * col("col_n")).cast("double"))
        .select(col("lang"), col("source"),
          (col("dev_d") * col("dev_d") /
            ((col("row_n") * col("col_n")).cast("double") * col("tot").cast("double")))
            .as("chi2_cell"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    }
    // perfectly independent 2×2 (equal cells) → every contribution is 0
    val indep = for { l <- Seq("en", "fr"); s <- Seq("a", "b"); _ <- 1 to 5 } yield (l, s)
    chi2(indep).values.foreach(_ shouldBe 0.0)
    // perfectly associated (en only in a, fr only in b) → all positive
    val assoc = Seq.fill(5)(("en", "a")) ++ Seq.fill(5)(("fr", "b"))
    chi2(assoc).values.foreach(_ should be > 0.0)
  }

  test("session metrics: bounce rate and mean duration from gap sessions") {
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2026-01-01 00:${m}%02d:00")
    // user 7: session A = 2 events spanning 60s, then a >10min gap, then a
    // 1-event bounce session; bounce_rate 1/2, avg duration (60+0)/2 = 30s
    val ev = Seq(
      (1L, ts(0), 7L, "view", 1.0), (2L, ts(1), 7L, "click", 1.0),
      (3L, ts(20), 7L, "view", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val sess = graft.streaming.Streams.sessionizeBatch(ev, gapMs = 10 * 60 * 1000L)
    val out = sess.groupBy("user_id").agg(
        count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounces"),
        sum(unix_micros(col("session_end")) - unix_micros(col("session_start")))
          .as("dur_us"))
      .select(
        (col("n_bounces").cast("double") / col("n_sessions")).as("bounce_rate"),
        (col("dur_us").cast("double") / col("n_sessions") / 1e6).as("avg_secs"))
      .collect()(0)
    out.getDouble(0) shouldBe 0.5
    out.getDouble(1) shouldBe 30.0
  }

  test("period-over-period growth is exact and null on the first day") {
    val d = (day: Int, n: Int) => (1 to n).map(i =>
      (day * 100L + i, java.sql.Timestamp.valueOf(f"2026-01-${day}%02d 01:00:00"), i.toLong, "view"))
    val ev = (d(1, 4) ++ d(2, 6) ++ d(3, 3)).toDF("event_id", "ts", "user_id", "event_type")
    val daily = ev.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("day")
    val rows = daily.withColumn("prev_n", lag("n", 1).over(w))
      .select(col("day"),
        ((col("n") - col("prev_n")).cast("double") / col("prev_n")).as("growth"))
      .collect().map(r => r.getDate(0).toString -> Option(r.get(1))).toMap
    rows("2026-01-01") shouldBe None
    rows("2026-01-02") shouldBe Some(0.5)   // 4 → 6
    rows("2026-01-03") shouldBe Some(-0.5)  // 6 → 3
  }

  test("cluster inertia is exact: identical members score 0, a known pair scores 2") {
    import graft.functions.VectorAgg
    // label 0: two copies of the same vector → inertia 0
    // label 1: (0,0) and (2,0) → centroid (1,0), each dist² = 1 → inertia 2, msd 1
    val emb = Seq(
      (1L, Seq(3f, 4f), 0), (2L, Seq(3f, 4f), 0),
      (3L, Seq(0f, 0f), 1), (4L, Seq(2f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val q = emb.select(col("vec_id"), col("label"),
      Dedup.quantize(col("embedding")).as("qv"))
    val sums = q.groupBy("label").agg(
      VectorAgg.vectorSum(col("qv"), 2).as("svec"), count(lit(1)).as("n"))
    val out = q.join(broadcast(sums), Seq("label"))
      .withColumn("contrib",
        aggregate(zip_with(col("qv"), col("svec"),
            (v, sv) => (v * col("n") - sv) * (v * col("n") - sv)),
          lit(0L), (acc, x) => acc + x))
      .groupBy("label")
      .agg(max(col("n")).as("n"), sum(col("contrib").cast("decimal(38,0)")).as("sc"))
      .select(col("label"),
        (col("sc").cast("double") / (col("n") * col("n")).cast("double") / 1e6)
          .as("inertia"),
        (col("sc").cast("double") /
          (col("n") * col("n") * col("n")).cast("double") / 1e6).as("msd"))
      .collect().map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    out(0) shouldBe ((0.0, 0.0))
    out(1) shouldBe ((2.0, 1.0))
  }

  test("lang confusion matrix: diagonal for marker-bearing text, shares sum to 1") {
    import graft.text.TextAnalysis
    val docs = Seq(
      (1L, "word the thing and more of it is here", "en"),
      (2L, "alpha the beta and gamma of delta is x", "en"),
      (3L, "sur le pont la ville et la mer est bleue", "fr"),
      (4L, "xyzzy qqq www", "fr")) // no markers → predicted 'und'
      .toDF("doc_id", "text", "lang")
    val m = docs.select(col("lang").as("actual"),
        TextAnalysis.langId(col("text")).as("predicted"))
      .groupBy("actual", "predicted").agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("actual")
    val rows = m.withColumn("row_share", col("n").cast("double") / sum("n").over(w))
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    rows(("en", "en")) shouldBe ((2L, 1.0))
    rows(("fr", "fr")) shouldBe ((1L, 0.5))
    rows(("fr", "und")) shouldBe ((1L, 0.5))
  }

  test("temperature quotas sum to exactly N and flatten toward the minority") {
    def quotas(df: org.apache.spark.sql.DataFrame): Map[String, Long] = {
      val all = org.apache.spark.sql.expressions.Window.partitionBy()
      df.groupBy("lang").agg(count(lit(1)).as("n"))
        .withColumn("sq", sqrt(col("n").cast("double")))
        .withColumn("ssum",
          aggregate(array_sort(collect_list(col("sq")).over(all)),
            lit(0d), (a, x) => a + x))
        .withColumn("rawq", col("sq") / col("ssum") * 1000)
        .withColumn("base", floor(col("rawq")).cast("long"))
        .withColumn("leftover", lit(1000L) - sum("base").over(all))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy((col("rawq") - col("base")).desc, col("lang"))))
        .select(col("lang"),
          (col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
            .as("quota"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    // 90/10 split: raw shares 900/100; sqrt flattening gives 3:1 → 750/250
    val docs = (Seq.fill(90)("en") ++ Seq.fill(10)("fr")).zipWithIndex
      .map { case (l, i) => (i.toLong, l) }.toDF("doc_id", "lang")
    val q = quotas(docs)
    q.values.sum shouldBe 1000L
    q("en") shouldBe 750L
    q("fr") shouldBe 250L
    quotas(docs.repartition(7)) shouldBe q // ordered fold → partition-invariant
  }

  test("pair features: identical docs score jaccard 1, equal lengths, same lang") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon", "en", 30L),
      (2L, "alpha beta gamma delta epsilon", "en", 30L),
      (3L, "totally different words here now", "fr", 33L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val pairs = docs.select(col("doc_id").as("id1"))
      .join(docs.select(col("doc_id").as("id2")), col("id1") < col("id2"))
    val out = Dedup.jaccardVerify(docs, pairs)
      .join(docs.select(col("doc_id").as("id1"), col("n_chars").as("c1"),
        col("lang").as("l1")), Seq("id1"))
      .join(docs.select(col("doc_id").as("id2"), col("n_chars").as("c2"),
        col("lang").as("l2")), Seq("id2"))
      .select(col("id1"), col("id2"), col("jaccard"),
        (least(col("c1"), col("c2")).cast("double") /
          greatest(col("c1"), col("c2"))).as("len_ratio"),
        (col("l1") === col("l2")).as("same_lang"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getBoolean(4)))).toMap
    out((1L, 2L)) shouldBe ((1.0, 1.0, true))
    out((1L, 3L))._1 shouldBe 0.0
    out((1L, 3L))._3 shouldBe false
  }

  test("readability: hand-computed flesch for a two-sentence doc") {
    // "go on. it is ok." → words=5? "go on. it is ok." split on spaces after
    // punctuation removal: tokens [go, on., it, is, ok.] = 5 words,
    // 2 sentences, vowel runs: o,o,i,i,o = 5 syllables
    val text = "go on. it is ok."
    val out = Seq((1L, text)).toDF("doc_id", "text")
      .select(
        org.apache.spark.sql.functions.size(
          split(trim(regexp_replace(col("text"), "\\s+", " ")), " "))
          .cast("bigint").as("w"),
        org.apache.spark.sql.functions.size(filter(
          transform(split(col("text"), "[.!?]+"), x => trim(x)), x => x =!= lit("")))
          .cast("bigint").as("s"),
        org.apache.spark.sql.functions.size(
          regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0)))
          .cast("bigint").as("sy"))
      .withColumn("flesch",
        lit(206.835) - lit(1.015) * (col("w").cast("double") / col("s"))
          - lit(84.6) * (col("sy").cast("double") / col("w")))
      .collect()(0)
    out.getLong(0) shouldBe 5L
    // split on [.!?]+ yields ["go on", " it is ok", ""] → trimmed non-empty = 2
    out.getLong(1) shouldBe 2L
    out.getLong(2) shouldBe 5L
  }

  test("packing report conserves tokens and numbers bins contiguously") {
    import graft.operators.Sampling
    import graft.text.TextAnalysis
    val docs = (1L to 40L).map(i => (i, (1 to (i % 7 + 3).toInt)
      .map(j => s"w$j").mkString(" "))).toDF("doc_id", "text")
    val shuffled = Sampling.shardedShuffle(docs, col("doc_id"), "ep1", 4)
    val packed = Sampling.packByTokenBudget(shuffled,
      TextAnalysis.tokenCount(col("text")), budget = 10)
    val bins = packed.groupBy("shard", "bin")
      .agg(sum(TextAnalysis.tokenCount(col("text"))).as("bin_tokens"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // conservation: per-shard bin totals == per-shard doc totals
    val byShardBins = bins.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val byShardDocs = shuffled
      .groupBy("shard").agg(sum(TextAnalysis.tokenCount(col("text"))).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    byShardBins shouldBe byShardDocs
    // bins are 0..n-1 with no gaps in every shard
    bins.groupBy(_._1).foreach { case (_, bs) =>
      val ids = bs.map(_._2).sorted
      ids shouldBe (0L until ids.length.toLong)
    }
  }

  test("vocab coverage: known counts, cuts clamp to the distinct-token count") {
    // tokens: a×4, b×2, c×1 → 7 occurrences, 3 distinct
    val docs = Seq((1L, "a a b c"), (2L, "a a b")).toDF("doc_id", "text")
    val toks = docs.select(explode(
      split(trim(regexp_replace(lower(col("text")), "\\s+", " ")), " ")).as("tok"))
      .where(col("tok") =!= "")
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("c").desc, col("tok"))
    val ranked = counts.withColumn("rk", row_number().over(w))
      .withColumn("cum", sum("c").over(w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)))
    val stats = counts.agg(sum("c").as("tot"), count(lit(1)).as("nd"))
    val out = Seq(1, 2, 100).toDF("vocab_size")
      .crossJoin(broadcast(stats))
      .withColumn("target_rk", least(col("vocab_size"), col("nd").cast("int")))
      .join(ranked, col("target_rk") === col("rk"))
      .select(col("vocab_size"), col("cum"),
        (col("cum").cast("double") / col("tot")).as("cov"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    out(1) shouldBe ((4L, 4.0 / 7))    // top-1 = 'a'
    out(2) shouldBe ((6L, 6.0 / 7))    // + 'b'
    out(100) shouldBe ((7L, 1.0))      // clamped to all 3 distinct tokens
  }

  test("burst detection: trailing median flags only the spike, first row never fires") {
    // minutes 0..9 at n=2, minute 10 at n=7 (> 3×2), minute 11 back to 2
    val perMin = ((0L to 9L).map((_, 2L)) ++ Seq((10L, 7L), (11L, 2L)))
      .toDF("minute", "n")
    val w = org.apache.spark.sql.expressions.Window.orderBy("minute")
      .rowsBetween(-10, -1)
    val out = perMin
      .withColumn("trail_med", expr("percentile(n, 0.5)").over(w))
      .select(col("minute"),
        (col("trail_med").isNotNull &&
          col("n").cast("double") > lit(3.0) * col("trail_med")).as("burst"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    out(0) shouldBe false // empty trailing frame → median null → never a burst
    (1L to 9L).foreach(m => out(m) shouldBe false)
    out(10L) shouldBe true
    out(11L) shouldBe false // spike joins the trailing window but median stays 2
  }

  test("markov transition rows normalize to probability 1 per source state") {
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2026-01-01 00:${m}%02d:00")
    val ev = Seq(
      (1L, ts(1), 7L, "a"), (2L, ts(2), 7L, "b"), (3L, ts(3), 7L, "a"),
      (4L, ts(4), 7L, "c"), (5L, ts(1), 8L, "a"), (6L, ts(2), 8L, "b"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = ev.withColumn("to_type", lead(col("event_type"), 1).over(w))
      .where(col("to_type").isNotNull)
      .select(col("event_type").as("from_type"), col("to_type"))
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n_trans"))
    val wf = org.apache.spark.sql.expressions.Window.partitionBy("from_type")
    val probs = trans.withColumn("n_from", sum("n_trans").over(wf))
      .select(col("from_type"),
        (col("n_trans").cast("double") / col("n_from")).as("prob"))
    // a→b twice (users 7 and 8), a→c once → P(b|a)=2/3, P(c|a)=1/3
    val fromA = probs.where(col("from_type") === "a")
      .select("prob").as[Double].collect().sorted.toSeq
    fromA shouldBe Seq(1.0 / 3, 2.0 / 3)
    probs.groupBy("from_type").agg(sum("prob").as("total"))
      .select("total").as[Double].collect().foreach(_ shouldBe 1.0 +- 1e-12)
  }
}
