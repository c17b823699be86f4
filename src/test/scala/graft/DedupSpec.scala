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
}
