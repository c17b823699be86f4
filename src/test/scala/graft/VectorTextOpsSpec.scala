package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.dedup.Dedup
import graft.functions.VectorAgg
import graft.operators.Graph
import graft.similarity.Projection
import graft.text.TextAnalysis

/** Hand-checked cases for the round-5 vector/text additions: JL sign
  * projection, PQ encoding, min-max scaling (+ the element-wise min/max
  * aggregates), TF-IDF top-k, co-occurrence lift, boilerplate removal,
  * incremental near-dup, and k-core peeling. */
class VectorTextOpsSpec extends SparkSpec {
  import spark.implicits._

  /** The Projection LCG sign, reimplemented independently. */
  private def sign(idx: Long): Long =
    if (((Projection.SignA * idx + Projection.SignC) % Projection.SignM) % 2 == 0) 1L else -1L

  test("jlProject matches a hand-computed sign projection and is linear") {
    val q = Seq(3L, -1L, 4L, 2L)
    val df = Seq((1L, q), (2L, q.map(_ * 2))).toDF("id", "qv")
    val out = df.select($"id", Projection.jlProject($"qv", inDim = 4, outDim = 2).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val expected = (0 until 2).map { p =>
      (0 until 4).map(j => q(j) * sign(p.toLong * 4 + j)).sum
    }
    out(1L) shouldBe expected
    out(2L) shouldBe expected.map(_ * 2) // integer linearity
  }

  /** The Projection PQ codebook, reimplemented independently. */
  private def cent(s: Int, k: Int, d: Int, nCent: Int, subDim: Int): Long = {
    val flat = (s.toLong * nCent + k) * subDim + d
    ((Projection.CentA * flat + Projection.CentC) % Projection.SignM) % Projection.CentRange -
      (Projection.CentRange - 1) / 2
  }

  test("pqEncode recovers exact-centroid vectors with zero error") {
    val nSub = 2; val nCent = 4; val subDim = 2
    // a vector equal to centroid 2 in subspace 0 and centroid 3 in subspace 1
    val v = Array(
      cent(0, 2, 0, nCent, subDim), cent(0, 2, 1, nCent, subDim),
      cent(1, 3, 0, nCent, subDim), cent(1, 3, 1, nCent, subDim))
    val df = Seq((1L, v.toSeq)).toDF("id", "qv")
    val r = df.select(Projection.pqEncode($"qv", 4, nSub, nCent).as("enc"))
      .select(
        transform($"enc", e => e.getField("code")).as("codes"),
        aggregate($"enc", lit(0L), (a, e) => a + e.getField("dist")).as("err"))
      .collect()(0)
    r.getSeq[Int](0) shouldBe Seq(2, 3)
    r.getLong(1) shouldBe 0L
  }

  test("pqEncode distance is the true squared L2 to the chosen centroid") {
    val nSub = 1; val nCent = 4; val subDim = 4
    val v = Seq(10L, -20L, 30L, -40L)
    val enc = Seq((1L, v)).toDF("id", "qv")
      .select(Projection.pqEncode($"qv", 4, nSub, nCent).as("enc"))
      .select(explode($"enc").as("e")).select($"e.code", $"e.dist")
      .collect()(0)
    val dists = (0 until nCent).map { k =>
      (0 until subDim).map { d =>
        val diff = v(d) - cent(0, k, d, nCent, subDim); diff * diff
      }.sum
    }
    enc.getInt(0) shouldBe dists.indexOf(dists.min)
    enc.getLong(1) shouldBe dists.min
  }

  test("codegen jlProject/pqEncode are bit-identical to the Column-algebra witnesses") {
    val vecs = (1 to 50).map { i =>
      (i.toLong, (0 until 8).map(j => ((i * 31 + j * 17) % 997 - 498).toLong))
    }
    val df = vecs.toDF("id", "qv")
    val fast = df.select($"id",
      Projection.jlProject($"qv", 8, 4).as("p"),
      Projection.pqEncode($"qv", 8, 2, 4).as("e")).collect()
    val slow = df.select($"id",
      Projection.jlProjectColumn($"qv", 8, 4).as("p"),
      Projection.pqEncodeColumn($"qv", 8, 2, 4).as("e")).collect()
    fast.map(_.toString) shouldBe slow.map(_.toString)
  }

  test("vectorMin/vectorMax bounds + minMaxScale hit 0 and the full scale") {
    val df = Seq(
      (1L, Seq(0L, 10L)), (2L, Seq(5L, 20L)), (3L, Seq(10L, 10L)))
      .toDF("id", "qv")
    val bounds = df.agg(
      VectorAgg.vectorMin($"qv", 2).as("mn"), VectorAgg.vectorMax($"qv", 2).as("mx"))
    bounds.collect()(0).getSeq[Long](0) shouldBe Seq(0L, 10L)
    bounds.collect()(0).getSeq[Long](1) shouldBe Seq(10L, 20L)
    val scaled = df.crossJoin(bounds)
      .select($"id", Projection.minMaxScale($"qv", $"mn", $"mx").as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    scaled(1L) shouldBe Seq(0L, 0L)
    scaled(2L) shouldBe Seq(5000L, 10000L)
    scaled(3L) shouldBe Seq(10000L, 0L)
  }

  test("vector min/max aggregates are partitioning-invariant and null-safe") {
    val vecs = (1 to 40).map(i => (i.toLong, Seq(i.toLong, -i.toLong)))
    val a = vecs.toDF("id", "qv").repartition(1)
      .agg(VectorAgg.vectorMin($"qv", 2), VectorAgg.vectorMax($"qv", 2)).collect()(0)
    val b = vecs.toDF("id", "qv").repartition(7)
      .agg(VectorAgg.vectorMin($"qv", 2), VectorAgg.vectorMax($"qv", 2)).collect()(0)
    a shouldBe b
    // all-null input evaluates to NULL, not a sentinel array
    val n = Seq((1L, null.asInstanceOf[Seq[Long]])).toDF("id", "qv")
      .agg(VectorAgg.vectorMin($"qv", 2).as("mn")).collect()(0)
    assert(n.isNullAt(0))
  }

  test("tfIdfTopK ranks rare terms above common ones") {
    val docs = Seq(
      (1L, "apple banana apple"), (2L, "banana cherry"), (3L, "banana durian"))
      .toDF("doc_id", "text")
    val top = TextAnalysis.tfIdfTopK(docs, topK = 2, minDf = 1)
      .where($"doc_id" === 1L).orderBy($"rank").collect()
    top.map(_.getString(2)) shouldBe Array("apple", "banana")
    // apple: tf=2, df=1, N=3 → 2·(3−1+0.5)/1.5 = 10/3
    top(0).getDouble(5) shouldBe (2.0 * (2.5 / 1.5)) +- 1e-12
  }

  test("cooccurLift matches hand-computed lift") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.cooccurLift(docs, minDf = 1, maxTokensPerDoc = 10,
        minPairDocs = 1)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(5)))
      .toMap
    // n_a=3, n_b=2, n_c=1, N=3; (a,b): 2·3/(3·2)=1; (a,c): 1·3/(3·1)=1
    out(("a", "b")) shouldBe ((2L, 1.0))
    out(("a", "c")) shouldBe ((1L, 1.0))
  }

  test("cooccurLift caps tokens per doc deterministically") {
    val docs = Seq((1L, "d c b a"), (2L, "d c b a")).toDF("doc_id", "text")
    val out = TextAnalysis.cooccurLift(docs, minDf = 1, maxTokensPerDoc = 2,
      minPairDocs = 1)
    // cap keeps the lexicographically FIRST two tokens: a, b
    out.collect().map(r => (r.getString(0), r.getString(1))).toSet shouldBe
      Set(("a", "b"))
  }

  test("boilerplateRemove drops shared windows from every doc; all-boilerplate docs vanish") {
    val docs = Seq(
      (1L, "a b c x y z"), (2L, "a b c q r s"), (3L, "a b c"))
      .toDF("doc_id", "text")
    val out = Dedup.boilerplateRemove(docs, segTokens = 3, minDocs = 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getInt(3)))
      .toMap
    out shouldBe Map(
      1L -> (("x y z", 1, 1)),
      2L -> (("q r s", 1, 1))) // doc 3 was pure boilerplate
  }

  test("boilerplateRemove counts DISTINCT docs (intra-doc repeats are not boilerplate)") {
    val docs = Seq((1L, "p q r p q r"), (2L, "u v w")).toDF("doc_id", "text")
    val out = Dedup.boilerplateRemove(docs, segTokens = 3, minDocs = 2)
    // "p q r" twice in ONE doc → not boilerplate, both copies survive
    out.where($"doc_id" === 1L).collect()(0).getString(1) shouldBe "p q r p q r"
  }

  test("incrementalNearDup finds batch-vs-index and batch-internal dups") {
    val text = "the quick brown fox jumps over the lazy dog again"
    val docs = Seq(
      (1L, text), (2L, "completely different words here entirely now"),
      (10L, text), // dup of indexed doc 1
      (11L, "another unique batch document with its own content"),
      (12L, "another unique batch document with its own content")) // dup of 11
      .toDF("doc_id", "text")
    val index = Dedup.minHashBuckets(docs.where($"doc_id" < 10), portable = true)
    val out = Dedup.incrementalNearDup(index, docs.where($"doc_id" >= 10), docs,
        minJaccard = 0.5, portable = true, maxBucketSize = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    out.toSet shouldBe Set((10L, 1L, 1.0), (12L, 11L, 1.0))
  }

  test("adcDistance equals the brute-force LUT sum; exact-centroid query ranks itself first") {
    val nSub = 2; val nCent = 4; val subDim = 2
    val q = Seq(7L, -3L, 11L, 5L)
    val lut = Projection.adcLut(q, nSub, nCent)
    // independent LUT recomputation
    for (s <- 0 until nSub; k <- 0 until nCent) {
      val expect = (0 until subDim).map { d =>
        val diff = q(s * subDim + d) - cent(s, k, d, nCent, subDim); diff * diff
      }.sum
      lut(s)(k) shouldBe expect
    }
    // a stored vector whose codes are the query's nearest centroids gets
    // the minimal possible ADC distance
    val best = (0 until nSub).map(s => lut(s).indexOf(lut(s).min))
    val rows = Seq(
      (1L, best.toSeq),
      (2L, Seq((best(0) + 1) % nCent, best(1))),
      (3L, Seq(best(0), (best(1) + 2) % nCent)))
    val out = rows.toDF("id", "codes")
      .select($"id", Projection.adcDistance($"codes", lut).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out(1L) shouldBe lut(0).min + lut(1).min
    out(1L) should be <= out(2L)
    out(1L) should be <= out(3L)
    // per-row check: ADC distance is exactly the sum of the row's lookups
    out(2L) shouldBe lut(0)((best(0) + 1) % nCent) + lut(1)(best(1))
  }

  test("blockedErJoin matches names within a block and never across blocks") {
    val recs = Seq(
      (1L, 0, "Customer#000000001"),
      (2L, 0, "Customer#000000002"),  // same block, 1-char difference
      (3L, 1, "Customer#000000001"),  // identical name, DIFFERENT block
      (4L, 0, "Zxqwvu#999"))          // same block, dissimilar
      .toDF("id", "block", "name")
    val out = Dedup.blockedErJoin(recs, "id", "block", "name", tNum = 3, tDen = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    out shouldBe Set((1L, 2L))
  }

  test("normalizeText lowercases, folds accents, and recomposes NFC") {
    val df = Seq("Café NAÏVE", "ASCII only", "éclair").toDF("text")
    val out = df.select(graft.functions.FastExprs.normalizeText($"text"))
      .collect().map(_.getString(0))
    out(0) shouldBe "cafe naive"
    out(1) shouldBe "ascii only"
    out(2) shouldBe "eclair" // decomposed é folds to plain e
  }

  test("incrementalNearDup over everything-as-batch equals the batch minHashDedup pairs") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven"),
      (4L, "one two three four five six seven"),
      (5L, "nothing like the others at all here"))
      .toDF("doc_id", "text")
    val emptyIndex = Dedup.minHashBuckets(docs.where($"doc_id" < 0), portable = true)
    val inc = Dedup.incrementalNearDup(emptyIndex, docs, docs,
        minJaccard = 0.5, portable = true, maxBucketSize = Int.MaxValue)
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSet // (match=older, newer)
    val batch = Dedup.minHashDedup(docs, threshold = 0.5, portable = true,
        maxBucketSize = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    inc shouldBe batch
  }

  test("kCore result is its own fixed point: every member has in-core degree >= k") {
    // lineitem-like random graph
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
      .toDF("src", "dst")
    val core = Graph.kCore(edges, k = 3, maxRounds = 10)
    val members = core.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Graph.unpersist(core)
    // recompute induced degrees independently
    val canon = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val induced = canon.filter { case (a, b) =>
      members.contains(a) && members.contains(b) }
    val deg = induced.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    members.foreach { case (n, d) =>
      deg.getOrElse(n, 0L) shouldBe d
      assert(d >= 3L, s"node $n has in-core degree $d < 3")
    }
  }

  test("topK aggregate matches a window rank and is partitioning-invariant") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 500).map(i => (i % 7, rnd.nextInt(50).toLong, i.toLong))
    val df = rows.toDF("g", "v", "id")
    def viaAgg(parts: Int) = df.repartition(parts)
      .select($"g", struct($"v", $"id").as("p"))
      .groupBy("g").agg(graft.functions.TopKAgg.topK($"p", 5).as("top"))
      .select($"g", posexplode($"top"))
      .select($"g", ($"pos" + 1).cast("long").as("rank"), $"col.v", $"col.id")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"v".desc, $"id")
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .where($"rank" <= 5)
      .select($"g", $"rank".cast("long"), $"v", $"id")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    viaAgg(1) shouldBe viaWindow
    viaAgg(13) shouldBe viaWindow
  }

  test("topK keeps groups smaller than k whole; ties order by id asc") {
    val df = Seq((1, 9L, 3L), (1, 9L, 1L), (1, 9L, 2L), (2, 5L, 9L))
      .toDF("g", "v", "id")
    val out = df.select($"g", struct($"v", $"id").as("p"))
      .groupBy("g").agg(graft.functions.TopKAgg.topK($"p", 2).as("top"))
      .collect().map(r => r.getInt(0) ->
        r.getSeq[Row](1).map(s => (s.getLong(0), s.getLong(1)))).toMap
    out(1) shouldBe Seq((9L, 1L), (9L, 2L)) // id breaks the tie
    out(2) shouldBe Seq((5L, 9L))           // fewer than k survives intact
  }

  test("q120 plan uses the aggregate path: no window, one shuffle") {
    val plan = Queries.q120GroupedTopk(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    plan should not include "Window"
    plan should include ("ObjectHashAggregate")
  }

  test("labelPropagation finds the two cliques; bridge node joins one deterministically") {
    // cliques {1,2,3} and {10,11,12}, bridged 3-10
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L)).toDF("src", "dst")
    val out = Graph.labelPropagation(edges, rounds = 3)
    val labels = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Graph.unpersist(out)
    labels(1L) shouldBe 1L
    labels(2L) shouldBe 1L
    Set(labels(10L), labels(11L), labels(12L)).size shouldBe 1
    // synchronous + (count desc, label asc) tie-break: reruns are identical
    val out2 = Graph.labelPropagation(edges, rounds = 3)
    val again = out2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Graph.unpersist(out2)
    again shouldBe labels
  }

  test("nearDupStream micro-batches equal one-shot incremental dedup") {
    val srcDir = tmpDir("neardup_src")
    val stateDir = tmpDir("neardup_state")
    val ckpt = tmpDir("neardup_ckpt")
    val text = "the quick brown fox jumps over the lazy dog again"
    val b1 = Seq((1L, text),
      (2L, "totally different early content over here")).toDF("doc_id", "text")
    val b2 = Seq((10L, text), // dup of batch-1 doc 1
      (11L, "another unique later document body entirely"),
      (12L, "another unique later document body entirely")) // dup of 11
      .toDF("doc_id", "text")
    b1.coalesce(1).write.parquet(s"$srcDir/b1")
    b2.coalesce(1).write.parquet(s"$srcDir/b2")
    // force the file-source order to match id order (mod-time ordering)
    def stamp(dir: String, t: Long): Unit =
      new java.io.File(dir).listFiles().foreach(_.setLastModified(t))
    stamp(s"$srcDir/b1", 1000000000000L)
    stamp(s"$srcDir/b2", 1000000100000L)
    val sch = spark.read.parquet(s"$srcDir/b1").schema
    val stream = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", 1)
      .option("recursiveFileLookup", "true").parquet(srcDir)
    val q = Dedup.nearDupStream(spark, stream, stateDir, ckpt,
      minJaccard = 0.5, portable = true, maxBucketSize = Int.MaxValue,
      availableNow = true)
    try q.awaitTermination() finally q.stop()
    val streamed = spark.read.parquet(s"$stateDir/pairs")
      .select("doc_id", "match_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    streamed shouldBe Set((10L, 1L), (12L, 11L))
    // and the durable index now covers everything ingested once
    val all = b1.unionByName(b2)
    val emptyIndex = Dedup.minHashBuckets(all.where($"doc_id" < 0), portable = true)
    val oneShot = Dedup.incrementalNearDup(emptyIndex, all, all,
        minJaccard = 0.5, portable = true, maxBucketSize = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    streamed shouldBe oneShot
    spark.read.parquet(s"$stateDir/index").select("doc_id").distinct().count() shouldBe 5L
  }

  test("cooccurLiftOn over baskets: co-purchase lift by hand") {
    val elems = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"), (3L, "x"))
      .toDF("id", "tok")
    val out = TextAnalysis.cooccurLiftOn(elems, minDf = 1, maxPerGroup = 10,
        minPairCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(5)))
    // x in 3 baskets, y in 2, together 2, N=3 → lift = 2·3/(3·2) = 1.0
    out.toSeq shouldBe Seq(("x", "y", 2L, 1.0))
  }

  test("jl_project / pq_encode / normalize_text are callable from SQL") {
    graft.functions.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT jl_project(array(3L, -1L, 4L, 2L), 4, 2) AS p,
        |  transform(pq_encode(array(10L, -20L, 30L, -40L), 4, 1, 4),
        |    e -> e.code) AS codes,
        |  normalize_text('Café NAÏVE') AS n""".stripMargin).collect()(0)
    val viaApi = Seq((1L, Seq(3L, -1L, 4L, 2L))).toDF("id", "qv")
      .select(Projection.jlProject($"qv", 4, 2)).collect()(0).getSeq[Long](0)
    r.getSeq[Long](0) shouldBe viaApi
    r.getSeq[Int](1) should have size 1
    r.getString(2) shouldBe "cafe naive"
  }

  test("sliding KMV union over buckets equals a rebuild over the window's rows") {
    import graft.functions.Sketches
    val k = 64
    val rows = (0 until 300).map(i => (i % 5, s"user${i % 37 + (i % 5) * 11}"))
    val df = rows.toDF("bucket", "u")
    val perBucket = df.groupBy("bucket")
      .agg(Sketches.kmvSketch(Sketches.hash63($"u"), k).as("sk"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("bucket").rangeBetween(-2, 0)
    val slid = perBucket.withColumn("sks", collect_list($"sk").over(w))
      .select($"bucket",
        Sketches.kmvEstimate(
          aggregate($"sks", array().cast("array<bigint>"),
            (acc, sk) => Sketches.kmvUnion(acc, sk, k)), k).as("est"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // independent rebuild: one sketch straight over each trailing window
    val direct = (0 until 5).map { b =>
      val users = rows.filter { case (bb, _) => bb >= b - 2 && bb <= b }
        .map(_._2).distinct.size
      b -> users.toDouble // all windows here are below k → exact
    }.toMap
    slid shouldBe direct
  }

  test("kCore peels to the dense core with in-core degrees") {
    // triangle 1-2-3 with a tail 3-4-5: 2-core = the triangle
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val core = Graph.kCore(edges, k = 2, maxRounds = 6)
    val rows = core.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Graph.unpersist(core)
    rows shouldBe Map(1L -> 2L, 2L -> 2L, 3L -> 2L)
  }

  test("kCore of a graph below k is empty; duplicate/reversed edges canonicalize") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L)).toDF("src", "dst")
    val core = Graph.kCore(edges, k = 2, maxRounds = 4)
    // path 1-2-3: endpoints peel first, then nothing has degree >= 2
    core.count() shouldBe 0L
    Graph.unpersist(core)
  }
}
