package graft

import graft.operators.Upsert

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq((1, "a", 10), (2, "b", 20)).toDF("k", "name", "v")
  private def source = Seq((2, "b2", 99), (3, "c", 30)).toDF("k", "name", "v")

  test("merge: matched rows updated, unmatched inserted") {
    val out = Upsert.merge(target, source, Seq("k"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
    out shouldBe Set((1, "a", 10), (2, "b2", 99), (3, "c", 30))
  }

  test("merge insertOnly: matched rows preserved") {
    val out = Upsert.merge(target, source, Seq("k"), insertOnly = true)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
    out shouldBe Set((1, "a", 10), (2, "b", 20), (3, "c", 30))
  }

  test("merge dedupes source on keys") {
    val dup = Seq((3, "c", 1), (3, "c", 1)).toDF("k", "name", "v")
    Upsert.merge(target, dup, Seq("k")).count() shouldBe 3
  }

  test("file upsert is idempotent") {
    val path = tmpDir("upsert") + "/t"
    Upsert.upsert(spark, path, target, Seq("k"))
    Upsert.upsert(spark, path, source, Seq("k"))
    val once = spark.read.parquet(path).collect().map(_.toSeq).toSet
    Upsert.upsert(spark, path, source, Seq("k"))   // replay the same batch
    val twice = spark.read.parquet(path).collect().map(_.toSeq).toSet
    twice shouldBe once
    once.map(s => (s(0), s(2))) shouldBe Set((1, 10), (2, 99), (3, 30))
  }

  test("partitioned upsert rewrites only touched partitions") {
    val path = tmpDir("upsertp") + "/t"
    val t0 = Seq((1, "p1", 10), (2, "p1", 20), (3, "p2", 30)).toDF("k", "part", "v")
    Upsert.upsert(spark, path, t0, Seq("k"), partitionCols = Seq("part"))
    val before = new java.io.File(s"$path/part=p2").lastModified()
    Thread.sleep(1100)
    val src = Seq((2, "p1", 99)).toDF("k", "part", "v")
    Upsert.upsert(spark, path, src, Seq("k"), partitionCols = Seq("part"))
    val after = spark.read.parquet(path)
    after.count() shouldBe 3
    after.where($"k" === 2).select("v").collect()(0).getInt(0) shouldBe 99
    // untouched partition directory was not rewritten
    new java.io.File(s"$path/part=p2").lastModified() shouldBe before
  }
}
