package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "THE  quick   brown fox jumps over the lazy dog"), // exact dup after norm
    (3L, "the quick brown fox jumps over the lazy cat"),    // near dup
    (4L, "completely different text about spark engines here"),
    (5L, "another unrelated document speaking of benchmarks")
  ).toDF("doc_id", "text")

  test("exact dedup keeps min id per normalized text") {
    val kept = Dedup.exactDedup(docs).select("doc_id").as[Long].collect().toSet
    kept shouldBe Set(1L, 3L, 4L, 5L)
    val groups = Dedup.exactGroups(docs)
    groups.where($"dup_count" === 2).select("keep_id").as[Long].collect() shouldBe Array(1L)
  }

  test("shingles produce distinct w-grams") {
    val sh = docs.where($"doc_id" === 1).select(Dedup.shingles($"text", 3).as("s"))
      .as[Seq[String]].collect()(0)
    sh should contain("the quick brown")
    sh should contain("the lazy dog")
    sh.length shouldBe 7 // 9 tokens → 7 trigrams, all distinct
  }

  test("minhash LSH finds the near-dup pair and jaccard verifies it") {
    val out = Dedup.minHashDedup(docs, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    out should contain((1L, 3L)) // 6/8 shared trigrams = 0.6 (after norm-dup 2)
    out should not contain ((1L, 4L))
    val j = Dedup.jaccardVerify(docs,
        Seq((1L, 3L)).toDF("id1", "id2")).collect()(0).getDouble(2)
    j shouldBe (6.0 / 8.0) +- 1e-12
  }

  test("fast portable minhash signature matches the Column-algebra portable path") {
    val cmp = docs.select(
      graft.functions.FastExprs.minHashSignature($"text", 3, 16, portable = true).as("fast"),
      Dedup.minHashSignature(Dedup.shingles($"text", 3), 16, portable = true).as("hof"))
    cmp.where($"fast" =!= $"hof").count() shouldBe 0
  }

  test("simhash groups exact dups together") {
    val g = Dedup.simHashGroups(docs)
    g.where($"dup_count" === 2).select("keep_id").as[Long].collect() shouldBe Array(1L)
  }

  test("fast simhash matches the Column-algebra path bit for bit") {
    // exercise edge shapes too: empty, whitespace-only, single token, mixed case
    val edgy = docs.select($"text")
      .unionByName(Seq("", "   ", "one", "MiXeD Case TOKENS here",
        "tab\tand\nnewline  spaced").toDF("text"))
    val cmp = edgy.select(
      graft.functions.FastExprs.simHash($"text").as("fast"),
      Dedup.simHashColumn($"text").as("hof"))
    cmp.where($"fast" =!= $"hof").count() shouldBe 0
  }

  test("banded simhash near-dup finds low-hamming pairs and verifies exactly") {
    val out = Dedup.simHashNearDup(docs, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // docs 1 and 2 are exact dups after normalization → hamming 0
    out should contain((1L, 2L, 0))
    // every emitted pair respects the bound
    all(out.map(_._3)) should be <= 8
    // candidates come only from equal bands: recompute hamming directly and
    // check the pigeonhole guarantee (hamming<=8 with 9 bands would always
    // pair; with our bands = maxHamming+1 any returned pair must share one)
    val sk = docs.select($"doc_id", Dedup.simHash($"text").as("sk"))
      .as[(Long, Long)].collect().toMap
    out.foreach { case (a, b, h) =>
      java.lang.Long.bitCount(sk(a) ^ sk(b)) shouldBe h
    }
  }

  test("minhash bucket cap drops oversized template buckets but keeps real pairs") {
    val clones = (100L until 130L).map(i => (i, "identical template boilerplate text row"))
    val salted = docs.unionByName(clones.toDF("doc_id", "text"))
    val capped = Dedup.minHashDedup(salted, threshold = 0.5, maxBucketSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the 30-clone bucket exceeds the cap → none of its 435 pairs survive
    capped.count { case (a, b) => a >= 100L && b >= 100L } shouldBe 0
    // genuine near-dups from small buckets are untouched
    capped should contain((1L, 3L))
    // sanity: uncapped DOES emit the clone pairs — the cap is what dropped them
    val uncapped = Dedup.minHashDedup(salted, threshold = 0.5, maxBucketSize = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    uncapped.count { case (a, b) => a >= 100L && b >= 100L } shouldBe 435
  }

  test("fast shingles match the Column-algebra path element for element") {
    val edgy = docs.select($"text")
      .unionByName(Seq("", "   ", "one", "one two", "a b a b a b c",
        "tab\tand\nnewline  spaced words").toDF("text"))
    val cmp = edgy.select(
      Dedup.shingles($"text", 3).as("fast"),
      Dedup.shinglesColumn($"text", 3).as("hof"))
    cmp.where(!($"fast" <=> $"hof")).count() shouldBe 0
  }

  test("connected components resolve pair chains into transitive clusters") {
    import graft.operators.Graph
    // chain 1-2-3 (1~3 never paired), clique 10-11-12, isolated edge 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (10L, 12L), (11L, 12L),
      (20L, 21L)).toDF("id1", "id2")
    val cc = Graph.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cc(1L) shouldBe 1L; cc(2L) shouldBe 1L; cc(3L) shouldBe 1L // chain merges
    cc(10L) shouldBe 10L; cc(11L) shouldBe 10L; cc(12L) shouldBe 10L
    cc(20L) shouldBe 20L; cc(21L) shouldBe 20L
    // docs without a pair keep themselves in the cluster assignment
    val docs = (1L to 5L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val assigned = Dedup.dedupClusters(docs, Seq((1L, 2L)).toDF("id1", "id2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assigned shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L, 5L -> 5L)
    // a long path needs diameter rounds — still converges deterministically
    val path = (0L until 12L).map(i => (i, i + 1)).toDF("id1", "id2")
    val pathCc = Graph.connectedComponents(path)
      .collect().map(r => r.getLong(1)).distinct
    pathCc shouldBe Array(0L)
    // executor storage is bounded: superseded per-round checkpoints and the
    // edge set are unpersisted as the rounds advance, so a full run leaves
    // only the returned labels snapshot behind — not O(rounds) snapshots
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val cc3 = Graph.connectedComponents(path) // 12 rounds of checkpoints
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    added.size should be <= 1
    Graph.unpersist(cc3) // releasing the result restores the baseline
    (spark.sparkContext.getPersistentRDDs.keySet.intersect(added)) shouldBe empty
  }

  test("segment dedup keeps first occurrences and reassembles documents") {
    val corpus = Seq(
      (1L, "a b c d e f"),        // segments (w=3): "a b c", "d e f"
      (2L, "a b c x y z"),        // "a b c" repeats doc 1 → only "x y z" kept
      (3L, "d e f"),              // fully duplicated → disappears
      (4L, "fresh words here")
    ).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(corpus, segTokens = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    out(1L) shouldBe ("a b c d e f", 2)
    out(2L) shouldBe ("x y z", 1)
    out.contains(3L) shouldBe false
    out(4L) shouldBe ("fresh words here", 1)
  }

  test("contamination flags docs sharing shingles with the probe") {
    val corpus = Seq(
      (10L, "the quick brown fox jumps"),
      (11L, "completely unrelated text body")
    ).toDF("doc_id", "text")
    val probe = Seq((1L, "quick brown fox runs fast")).toDF("doc_id", "text")
    val hits = Dedup.contamination(corpus, probe)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    hits shouldBe Map(10L -> 1) // shared 3-shingle: "quick brown fox"
  }

  test("embedding near-dup finds parallel vectors") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f, 0.5f)),
      (2L, Seq(0.9f, 0.01f, 0.45f)), // nearly parallel to 1
      (3L, Seq(-1.0f, 0.2f, 0.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDup(emb, threshold = 0.95, cap = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs shouldBe Set((1L, 2L))
  }

  test("lsh cosine near-dup: subset of brute force, parallel vectors found") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f, 0.5f)),
      (2L, Seq(0.9f, 0.01f, 0.45f)), // nearly parallel to 1 → same bucket
      (3L, Seq(-1.0f, 0.2f, 0.0f)),
      (4L, Seq(0.0f, 1.0f, -0.3f)),
      (5L, Seq(0.02f, 0.98f, -0.29f)) // nearly parallel to 4
    ).toDF("vec_id", "embedding")
    val brute = Dedup.embeddingNearDup(emb, threshold = 0.95, cap = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.cosineNearDupLsh(emb, threshold = 0.95, planes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // approximate: never a false positive vs brute force at the same θ
    lsh.subsetOf(brute) shouldBe true
    // parallel vectors collide in every sign bucket → always recalled
    lsh should contain((1L, 2L))
    lsh should contain((4L, 5L))
    // each emitted pair appears exactly once (probe legs don't double-emit)
    val rows = Dedup.cosineNearDupLsh(emb, threshold = 0.95, planes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    rows.length shouldBe rows.toSet.size
    // many-plane configs take the window-guard fallback (the ok-bucket
    // set could approach corpus size — unbroadcastable); same contract
    val wide = Dedup.cosineNearDupLsh(emb, threshold = 0.95, planes = 22)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    wide.subsetOf(brute) shouldBe true
  }

  test("semantic dedup: within-cell keep-first, cross-cell pairs never compared") {
    // two orthogonal directions → two cells (centroids seeded from ids 1, 2);
    // 1∥3∥5 cluster together, 2∥4 together, 6 is alone in cell 1's direction
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f)),
      (3L, Seq(0.99f, 0.01f, 0.0f)),  // dup of 1 (same cell, lower id kept)
      (4L, Seq(0.01f, 0.99f, 0.0f)),  // dup of 2
      (5L, Seq(0.98f, 0.0f, 0.01f)),  // dup of 1 AND 3 → still one drop row
      (6L, Seq(0.6f, 0.0f, -0.8f))    // cell of 1, but cosine 0.6 < 0.9
    ).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(emb, threshold = 0.9, nlist = 2)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    out.keySet shouldBe Set(1L, 2L, 3L, 4L, 5L, 6L) // every row reported
    out(1L)._2 shouldBe true   // first of its group
    out(2L)._2 shouldBe true
    out(3L)._2 shouldBe false  // lower-id cell-mate 1 above threshold
    out(4L)._2 shouldBe false
    out(5L)._2 shouldBe false
    out(6L)._2 shouldBe true   // same cell as 1, below threshold
    out(1L)._1 shouldBe out(3L)._1 // the x-direction cell
    out(2L)._1 shouldBe out(4L)._1 // the y-direction cell
    out(1L)._1 should not be out(2L)._1
  }

  test("semantic dedup: trained centroids slot in without changing the contract") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(0.99f, 0.01f)), (4L, Seq(0.01f, 0.99f))
    ).toDF("vec_id", "embedding")
    val cents = graft.similarity.Similarity.trainCentroids(emb, nlist = 2, iters = 2)
    val out = Dedup.semanticDedup(emb, threshold = 0.9, centroids = cents)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    out shouldBe Map(1L -> true, 2L -> true, 3L -> false, 4L -> false)
  }
}
