package graft

import org.apache.spark.sql.functions._

import graft.similarity.Similarity

/** Hand-checked cases for the corpus-curation batch: source-level gating,
  * percent-rank language floor, equi-depth binning, hard-negative mining,
  * and the exact-arithmetic Gini–Simpson diversity index. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("source curation keeps exactly the sources inside the mean-length band") {
    // srcA mean 300 (in [280,330]), srcB mean 200 (below), srcC mean 400 (above)
    val docs = Seq.tabulate(30) { i =>
      val (src, base) = i % 3 match {
        case 0 => ("srcA", 300L)
        case 1 => ("srcB", 200L)
        case _ => ("srcC", 400L)
      }
      // symmetric wiggle so the mean stays exactly at base
      val wiggle = Seq(-5L, 0L, 5L, 0L, -5L, 5L, 0L, 0L, -5L, 5L)(i / 3)
      (i.toLong, "t", if (i % 5 == 0) "en" else "fr", src, base + wiggle)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val stats = docs.groupBy("source").agg(
      count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
    val kept = stats.where(col("n_docs") >= 10 &&
        col("sum_chars") >= col("n_docs") * 280 &&
        col("sum_chars") <= col("n_docs") * 330)
      .select("source").as[String].collect().toSet
    kept shouldBe Set("srcA")
    val out = docs.join(broadcast(stats.where(col("sum_chars") >= col("n_docs") * 280 &&
        col("sum_chars") <= col("n_docs") * 330).select("source")),
        Seq("source"), "left_semi")
      .groupBy("source", "lang").agg(count(lit(1)).as("n_kept"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    out shouldBe Map(("srcA", "en") -> 2L, ("srcA", "fr") -> 8L)
  }

  test("percent-rank floor keeps the top 90% and is exact at the boundary") {
    // 11 docs in one lang, lengths 100..200 step 10: percent_rank of the
    // i-th is i/10; the 0.1 cut drops exactly the shortest doc
    val docs = (0 to 10).map(i => (i.toLong, "t", "en", "s", 100L + 10 * i))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("n_chars")
    val out = docs.withColumn("pr", percent_rank().over(w))
      .groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("pr") >= 0.1, 1L).otherwise(0L)).as("n_kept"),
        min(when(col("pr") >= 0.1, col("n_chars"))).as("floor_chars"))
      .collect()(0)
    out.getLong(1) shouldBe 11L
    out.getLong(2) shouldBe 10L // pr of the second doc is exactly 0.1 → kept
    out.getLong(3) shouldBe 110L
  }

  test("equi-depth ntile front-loads the remainder deterministically") {
    // 10 rows into 4 bins → sizes 3,3,2,2 in the (n_chars, doc_id) order
    val docs = (0 until 10).map(i => (i.toLong, "t", "en", "s", 100L + i))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("n_chars"), col("doc_id"))
    val bins = docs.withColumn("bin", ntile(4).over(w))
      .groupBy("bin").agg(count(lit(1)).as("n"),
        min("n_chars").as("lo"), max("n_chars").as("hi"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    bins shouldBe Map(
      1 -> ((3L, 100L, 102L)), 2 -> ((3L, 103L, 105L)),
      3 -> ((2L, 106L, 107L)), 4 -> ((2L, 108L, 109L)))
  }

  test("hard negatives exclude the query's own label and rank by cosine") {
    // axis-aligned vectors: query (1,0) label 0; same-label near-twin must
    // NOT appear; the nearest different-label vector wins rank 1
    val emb = Seq(
      (0L, Seq(1f, 0f), 0),     // query, label 0
      (1L, Seq(0.99f, 0.1f), 0), // same label — excluded despite cos≈1
      (2L, Seq(0.9f, 0.4f), 1),  // different label, closest
      (3L, Seq(0f, 1f), 1),      // different label, orthogonal
      (4L, Seq(-1f, 0f), 2))     // different label, opposite
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(emb, emb.where(col("vec_id") === 0L), k = 3)
      .select("corpus_id", "rank").as[(Long, Int)].collect().toMap
    out.keySet should not contain 1L
    out shouldBe Map(2L -> 1, 3L -> 2, 4L -> 3)
  }

  test("doc chunking: stride windows cover every token exactly once per window rule") {
    // 60 tokens, W=50 S=25 → starts 0,25 (start 50 adds nothing beyond 25's chunk)
    def chunksOf(n: Int): Seq[(Int, Long)] = {
      val text = (1 to n).map(i => s"w$i").mkString(" ")
      val df = Seq((1L, text)).toDF("doc_id", "text")
        .withColumn("toks", split(trim(regexp_replace(col("text"), "\\s+", " ")), " "))
        .withColumn("n_toks", org.apache.spark.sql.functions.size(col("toks")))
        .select(col("doc_id"), col("toks"), col("n_toks"),
          explode(filter(sequence(lit(0), greatest(col("n_toks") - 1, lit(0)), lit(25)),
            st => st === 0 || st + lit(25) < col("n_toks"))).as("start"))
        .select((col("start") / 25).cast("int").as("chunk_no"),
          least(lit(50), col("n_toks") - col("start")).cast("bigint").as("chunk_toks"))
      df.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq.sorted
    }
    chunksOf(60) shouldBe Seq((0, 50L), (1, 35L))
    chunksOf(40) shouldBe Seq((0, 40L))   // tail start 25 adds nothing new
    chunksOf(50) shouldBe Seq((0, 50L))
    chunksOf(51) shouldBe Seq((0, 50L), (1, 26L))
    chunksOf(100) shouldBe Seq((0, 50L), (1, 50L), (2, 50L))
  }

  test("k-anonymity generalization picks hour, band, or suppressed per cell") {
    // type t: hour 0 has 5 rows (>=k=3 at hour level), hour 1 has 2 rows but
    // band 0 totals 7 (>=3 → band), hour 23 alone has 1 row and band 3 has
    // only 1 → suppressed
    val k = 3
    val rows = Seq.fill(5)(("t", 0)) ++ Seq.fill(2)(("t", 1)) ++ Seq(("t", 23))
    val hourCnt = rows.toDF("event_type", "hr")
      .groupBy("event_type", "hr").agg(count(lit(1)).as("n_rows"))
    val bandCnt = hourCnt.withColumn("band", expr("hr div 6"))
      .groupBy("event_type", "band").agg(sum("n_rows").as("band_rows"))
    val out = hourCnt.withColumn("band", expr("hr div 6"))
      .join(broadcast(bandCnt), Seq("event_type", "band"))
      .select(col("hr"),
        when(col("n_rows") >= k, "hour")
          .when(col("band_rows") >= k, "band")
          .otherwise("suppressed").as("level"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    out shouldBe Map(0 -> "hour", 1 -> "band", 23 -> "suppressed")
  }

  test("entity snapshot keeps the latest value per type, ties broken by event id") {
    val ts0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val ts1 = java.sql.Timestamp.valueOf("2026-01-01 00:00:01")
    // user 7: two clicks at the same ts → higher event_id wins; one view earlier
    val ev = Seq(
      (1L, ts1, 7L, "click", 10.0), (2L, ts1, 7L, "click", 20.0),
      (3L, ts0, 7L, "view", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "event_type")
      .orderBy(col("ts").desc, col("event_id").desc)
    val out = ev.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .groupBy("user_id").agg(
        max(when(col("event_type") === "click", col("value"))).as("click_value"),
        max(when(col("event_type") === "view", col("value"))).as("view_value"),
        max(col("ts")).as("last_seen"))
      .collect()(0)
    out.getDouble(1) shouldBe 20.0 // event_id 2 beats 1 at the same ts
    out.getDouble(2) shouldBe 5.0
    out.getTimestamp(3) shouldBe ts1
  }

  test("source purity: majority share and impurity for a known mix") {
    // srcA: 3 en + 1 fr → majority 0.75, gini = 1 - (9+1)/16 = 0.375
    val docs = Seq(("srcA", "en"), ("srcA", "en"), ("srcA", "en"), ("srcA", "fr"),
      ("srcB", "de")).toDF("source", "lang")
    val cells = docs.groupBy("source", "lang").agg(count(lit(1)).as("c"))
    val out = cells.groupBy("source").agg(
        count(lit(1)).as("n_langs"), sum("c").as("n_docs"),
        max("c").as("top_c"), sum(col("c") * col("c")).as("ss"))
      .select(col("source"),
        (col("top_c").cast("double") / col("n_docs")).as("maj"),
        ((col("n_docs") * col("n_docs") - col("ss")).cast("double") /
          (col("n_docs") * col("n_docs")).cast("double")).as("gini"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    out("srcA") shouldBe ((0.75, 0.375))
    out("srcB") shouldBe ((1.0, 0.0))
  }

  test("fk audit counts orphans and flags the broken relationship") {
    val child = Seq((1L, 10L), (2L, 10L), (3L, 99L)).toDF("id", "fk") // 99 orphan
    val parent = Seq((10L, "x"), (20L, "y")).toDF("pk", "v")
    val orphans = child.join(
      broadcast(parent.select(col("pk").as("fk")).distinct()), Seq("fk"), "left_anti")
    val out = child.agg(count(lit(1)).as("child_rows"))
      .crossJoin(orphans.agg(count(lit(1)).as("orphans")))
      .select(col("child_rows"), col("orphans"), (col("orphans") === 0L).as("ok"))
      .collect()(0)
    out.getLong(0) shouldBe 3L
    out.getLong(1) shouldBe 1L
    out.getBoolean(2) shouldBe false
  }

  test("dedup impact: size distribution and removal counts from known clusters") {
    import graft.dedup.Dedup
    val docs = (1L to 7L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // pairs chain {1,2,3} and {4,5}; 6 and 7 stay singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id1", "id2")
    val out = Dedup.dedupClusters(docs, pairs)
      .groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        ((col("cluster_size") - 1) * col("n_clusters")).as("docs_removed"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    out shouldBe Map(3L -> ((1L, 2L)), 2L -> ((1L, 1L)), 1L -> ((2L, 0L)))
  }

  test("dedup weights: every cluster contributes total weight 1") {
    import graft.dedup.Dedup
    val docs = (1L to 7L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id1", "id2")
    val clusters = Dedup.dedupClusters(docs, pairs)
    val sizes = clusters.groupBy("cluster_id").agg(count(lit(1)).as("sz"))
    val weighted = clusters.join(broadcast(sizes), Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"),
        (lit(1.0) / col("sz")).as("w"))
    // each content cluster sums to exactly 1 in expectation
    val perCluster = weighted.groupBy("cluster_id").agg(sum("w").as("tw"))
      .select("tw").as[Double].collect()
    perCluster.foreach(_ shouldBe 1.0 +- 1e-12)
    weighted.count() shouldBe 7L // provenance survives: no row deleted
    val w123 = weighted.where(col("doc_id") === 1L)
      .select("w").as[Double].collect()(0)
    w123 shouldBe 1.0 / 3
  }

  test("minhash recall eval: predictions are a subset of truth (precision 1), bounds hold") {
    import graft.dedup.Dedup
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(col("doc_id") < 50)
    val pred = Dedup.minHashDedup(docs, threshold = 0.5, portable = true,
      maxBucketSize = Int.MaxValue).select("id1", "id2")
    val allPairs = docs.select(col("doc_id").as("id1"))
      .join(docs.select(col("doc_id").as("id2")), col("id1") < col("id2"))
    val truth = Dedup.jaccardVerify(docs, allPairs)
      .where(col("jaccard") >= 0.5).select("id1", "id2")
    val nPred = pred.count()
    val nTruth = truth.count()
    val nHit = truth.join(pred, Seq("id1", "id2"), "left_semi").count()
    // verification step makes every prediction a true positive
    pred.join(truth, Seq("id1", "id2"), "left_anti").count() shouldBe 0L
    nHit shouldBe nPred // pred ⊆ truth ⟹ every prediction is a hit
    nHit should be <= nTruth
    nTruth should be > 0L // the frame actually contains near-dups
  }

  test("Gini–Simpson is 0 for a single group and (n-1)/n for uniform groups") {
    def gini(df: org.apache.spark.sql.DataFrame, keyCol: String): Double =
      df.groupBy(keyCol).agg(count(lit(1)).as("c"))
        .agg(sum(col("c")).as("n"), sum(col("c") * col("c")).as("ss"))
        .select(((col("n") * col("n") - col("ss")).cast("double") /
          (col("n") * col("n")).cast("double")))
        .as[Double].collect()(0)
    val single = Seq(("a", 1), ("a", 2), ("a", 3)).toDF("k", "v")
    gini(single, "k") shouldBe 0.0
    // 4 uniform groups of 2 → 1 - 4·(2/8)² = 0.75, exactly representable
    val uniform = (0 until 8).map(i => (s"g${i % 4}", i)).toDF("k", "v")
    gini(uniform, "k") shouldBe 0.75
  }
}
