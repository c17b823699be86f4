package graft

import org.apache.spark.sql.functions._
import graft.similarity.Similarity
import graft.text.TextAnalysis

class TextSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("token counts and bpe-ish segmentation") {
    val r = Seq("Hello, world! 42 times").toDF("text").select(
      TextAnalysis.tokenCount($"text").as("t"),
      TextAnalysis.bpeishTokenCount($"text").as("b")).collect()(0)
    r.getInt(0) shouldBe 4
    // Hello , world ! 42 times → 6
    r.getInt(1) shouldBe 6
  }

  test("adjacent pairs count every occurrence; top-k is deterministic under ties") {
    import graft.text.TextAnalysis
    val docs = Seq("a b a b c", "a b", "x", "").toDF("text")
    val pairs = docs.select(explode(TextAnalysis.adjacentPairs($"text")).as("p"))
      .groupBy("p").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "a b a b c" → a b, b a, a b, b c; "a b" → a b; single/empty → none
    pairs shouldBe Map("a b" -> 3L, "b a" -> 1L, "b c" -> 1L)
    val top = TextAnalysis.topPairs(docs, "text", 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    top shouldBe Array(("a b", 3L), ("b a", 1L)) // tie b a/b c → lexicographic
  }

  test("langId picks marker-heavy language, und when none") {
    val df = Seq(
      "the cat is on the mat and the dog is here",
      "el perro de la casa es que grande",
      "xyz qqq zzz").toDF("text")
      .select(TextAnalysis.langId($"text").as("l")).as[String].collect()
    df(0) shouldBe "en"
    df(1) shouldBe "es"
    df(2) shouldBe "und"
  }

  test("quality score bounds and ordering") {
    val scores = Seq(
      "the spark engine is a fast engine and it is good to use in the cluster",
      "!!! ??? ### $$$ %%%").toDF("text")
      .select(TextAnalysis.qualityScore($"text").as("q")).as[Double].collect()
    all(scores) should (be >= 0.0 and be <= 1.0)
    scores(0) should be > scores(1)
  }

  test("redact scrubs emails, urls, and long numbers") {
    val out = Seq("mail a.b+c@ex-ample.org or visit https://x.io/p?q=1 id 1234567890 ok")
      .toDF("text").select(TextAnalysis.redact($"text")).as[String].collect()(0)
    out shouldBe "mail <EMAIL> or visit <URL> id <NUM> ok"
    // multi-occurrence: all matches replaced, not just the first (the
    // corpus has no PII, so the oracle can't exercise this — the DuckDB
    // fragment needs the 'g' flag to agree)
    Seq("a@b.co c@d.io and 123456789 987654321").toDF("text")
      .select(TextAnalysis.redact($"text")).as[String].collect()(0) shouldBe
      "<EMAIL> <EMAIL> and <NUM> <NUM>"
    // short numbers and bare words untouched
    Seq("call 12345 now").toDF("text")
      .select(TextAnalysis.redact($"text")).as[String].collect()(0) shouldBe "call 12345 now"
  }

  test("repetition ratio is 0 for unique text and high for loops") {
    val r = Seq("a b c d e f", "spam ham spam ham spam ham spam ham").toDF("text")
      .select(TextAnalysis.repetitionRatio($"text", 2).as("r")).as[Double].collect()
    r(0) shouldBe 0.0
    r(1) should be > 0.6 // "spam ham"/"ham spam" repeat throughout
  }

  test("fast repetition ratio matches the Column-algebra path exactly") {
    val edgy = Seq("", "   ", "one", "one two", "a b a b a b",
      "tab\tand\nnewline  spaced words tab\tand", "x " * 500).toDF("text")
    for (w <- Seq(2, 3, 4)) {
      val cmp = edgy.select(
        TextAnalysis.repetitionRatio($"text", w).as("fast"),
        TextAnalysis.repetitionRatioColumn($"text", w).as("hof"))
      withClue(s"w=$w") { cmp.where($"fast" =!= $"hof").count() shouldBe 0 }
    }
  }

  test("fingerprint is deterministic and order-sensitive") {
    val fp = Seq("a b c", "a b c", "c b a").toDF("text")
      .select(TextAnalysis.fingerprint($"text").as("f")).as[Long].collect()
    fp(0) shouldBe fp(1)
    fp(0) should not be fp(2)
  }

  test("fast fingerprint matches the Column-algebra path exactly") {
    val edgy = Seq("", "   ", "one", "repeat repeat repeat",
      "tab\tand\nnewline  spaced", "unicode tiếng việt ăn ở").toDF("text")
    val cmp = edgy.select(
      TextAnalysis.fingerprint($"text").as("fast"),
      TextAnalysis.fingerprintColumn($"text").as("hof"))
    cmp.where($"fast" =!= $"hof").count() shouldBe 0
  }

  test("brute-force topk ranks by exact cosine") {
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f)),   // closest to 0
      (2L, Seq(0.0f, 1.0f)),   // orthogonal
      (3L, Seq(0.5f, 0.4f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(emb, emb.where($"vec_id" === 0), k = 2)
      .orderBy("rank").select("corpus_id").as[Long].collect()
    top shouldBe Array(1L, 3L)
  }

  test("fast sign-LSH bucket is bit-identical to the Column-algebra bucket") {
    val emb = (0L until 40L).map { i =>
      (i, Seq.tabulate(16)(d => math.sin(i * 13 + d * 5).toFloat))
    }.toDF("vec_id", "embedding")
    val m = Similarity.planeMatrix(5, 16)
    val q = graft.dedup.Dedup.quantize($"embedding")
    emb.select(
        Similarity.signLshBucket(q, 5).as("legacy"),
        graft.functions.FastExprs.signLshBucket(q, m).as("fast"))
      .where($"legacy" =!= $"fast").count() shouldBe 0
  }

  test("lsh topk only probes matching buckets and stays a subset of brute force") {
    val emb = (0L until 50L).map { i =>
      (i, Seq.tabulate(8)(d => math.sin(i * 31 + d * 7).toFloat))
    }.toDF("vec_id", "embedding")
    val q = emb.where($"vec_id" < 3)
    val brute = Similarity.bruteForceTopK(emb, q, k = 50).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Similarity.lshTopK(emb, q, k = 50, planes = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    lsh.length should be > 0
    // every LSH hit is a genuine (query, corpus, score) from the exact scan
    lsh.map(x => (x._1, x._2, x._3)).toSet.subsetOf(brute) shouldBe true
  }
}
