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

  test("partitioned upsert moves a key whose partition value changed") {
    val path = tmpDir("upsertm") + "/t"
    val t0 = Seq((1, "2025-10-09", 10), (2, "2025-10-09", 20)).toDF("k", "date", "v")
    Upsert.upsert(spark, path, t0, Seq("k"), partitionCols = Seq("date"))
    // key 1 re-arrives with a corrected date: must not survive in the old partition
    val src = Seq((1, "2025-10-10", 99)).toDF("k", "date", "v")
    Upsert.upsert(spark, path, src, Seq("k"), partitionCols = Seq("date"))
    val out = spark.read.parquet(path)
    out.where($"k" === 1).collect().map(r =>
      (r.getAs[Any]("date").toString, r.getAs[Int]("v"))).toSeq shouldBe
      Seq(("2025-10-10", 99))
    out.count() shouldBe 2
  }

  test("partitioned upsert drops a partition that lost all its rows") {
    val path = tmpDir("upserte") + "/t"
    val t0 = Seq((1, "p1", 10), (2, "p2", 20)).toDF("k", "part", "v")
    Upsert.upsert(spark, path, t0, Seq("k"), partitionCols = Seq("part"))
    // the only p1 row migrates to p2 → partition p1 must disappear
    Upsert.upsert(spark, path, Seq((1, "p2", 11)).toDF("k", "part", "v"),
      Seq("k"), partitionCols = Seq("part"))
    spark.read.parquet(path).count() shouldBe 2
    new java.io.File(s"$path/part=p1").exists() shouldBe false
  }

  test("upsert recovers a table stranded mid-swap") {
    val path = tmpDir("upsertr") + "/t"
    Upsert.upsert(spark, path, target, Seq("k"))
    // simulate a crash between the two swap renames: table dir moved aside
    new java.io.File(path).renameTo(new java.io.File(path + "__old")) shouldBe true
    Upsert.upsert(spark, path, source, Seq("k"))
    val out = spark.read.parquet(path)
    out.count() shouldBe 3 // recovery restored the 2 old rows, merge applied source
    out.where($"k" === 1).count() shouldBe 1
  }

  test("merge picks a deterministic winner among duplicate source keys") {
    val dup = Seq((3, "a", 1), (3, "b", 2), (3, "c", 3)).toDF("k", "name", "v")
    val r1 = Upsert.merge(target, dup, Seq("k")).where($"k" === 3).collect()
    val r2 = Upsert.merge(target, dup.repartition(7), Seq("k"))
      .where($"k" === 3).collect()
    r1.length shouldBe 1
    r1.map(_.toSeq).toSeq shouldBe r2.map(_.toSeq).toSeq // partitioning-independent
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

  test("upsert evolves the schema additively when asked, fails loudly when not") {
    val path = tmpDir("upserte") + "/t"
    Upsert.upsert(spark, path, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Seq("k"))

    // drifted source without opt-in → loud failure, table untouched
    val drifted = Seq((2L, "B", 7)).toDF("k", "v", "extra")
    an[Exception] should be thrownBy
      Upsert.upsert(spark, path, drifted, Seq("k"))
    spark.read.parquet(path).columns.sorted shouldBe Array("k", "v")

    // with evolveSchema: new column appears, pre-evolution rows read NULL
    Upsert.upsert(spark, path, drifted, Seq("k"), evolveSchema = true)
    val t = spark.read.parquet(path)
    t.columns.sorted shouldBe Array("extra", "k", "v")
    t.where($"k" === 2L).select("extra").collect()(0).getInt(0) shouldBe 7
    t.where($"k" === 1L).select("extra").collect()(0).isNullAt(0) shouldBe true

    // a source missing a known column NULL-fills it for replaced rows
    Upsert.upsert(spark, path,
      Seq((1L, 11)).toDF("k", "extra"), Seq("k"), evolveSchema = true)
    val t2 = spark.read.parquet(path)
    t2.where($"k" === 1L).select("v").collect()(0).isNullAt(0) shouldBe true
    t2.where($"k" === 2L).select("v").collect()(0).getString(0) shouldBe "B"

    // type change is never silently cast
    an[IllegalArgumentException] should be thrownBy
      Upsert.upsert(spark, path, Seq((1L, 1.5)).toDF("k", "v"), Seq("k"),
        evolveSchema = true)
  }

  test("second concurrent writer fails loudly; table unchanged") {
    val path = tmpDir("upsertlk") + "/t"
    Upsert.upsert(spark, path, target, Seq("k"))
    // writer A holds the lease mid-merge…
    val tokenA = Upsert.acquireLock(spark, path, Upsert.DefaultLockTtlMs)
    try {
      // …so writer B must raise, not interleave with A's staged swap
      val ex = the[Upsert.ConcurrentWriteException] thrownBy
        Upsert.upsert(spark, path, source, Seq("k"))
      ex.getMessage should include("locked by another writer")
      spark.read.parquet(path).count() shouldBe 2 // B wrote nothing
    } finally Upsert.releaseLock(spark, path, tokenA)
    // A released → B's retry wins
    Upsert.upsert(spark, path, source, Seq("k"))
    spark.read.parquet(path).count() shouldBe 3
  }

  test("stale lease past TTL is taken over") {
    val path = tmpDir("upsertstale") + "/t"
    Upsert.upsert(spark, path, target, Seq("k"))
    Upsert.acquireLock(spark, path, Upsert.DefaultLockTtlMs)
    val lock = new java.io.File(path + "__lock")
    lock.exists() shouldBe true
    // age the lease past the 1s TTL we pass below → crashed-writer takeover
    lock.setLastModified(System.currentTimeMillis() - 10000) shouldBe true
    Upsert.upsert(spark, path, source, Seq("k"), lockTtlMs = 1000)
    spark.read.parquet(path).count() shouldBe 3
    lock.exists() shouldBe false // takeover released its own lease
  }

  test("TTL-expired writer cannot release its successor's lease or swap") {
    val path = tmpDir("upserttok") + "/t"
    Upsert.upsert(spark, path, target, Seq("k"))
    // writer A acquires, then its merge outlives the TTL…
    val tokenA = Upsert.acquireLock(spark, path, Upsert.DefaultLockTtlMs)
    val lock = new java.io.File(path + "__lock")
    lock.setLastModified(System.currentTimeMillis() - 10000) shouldBe true
    // …writer B legitimately takes the stale lease over
    val tokenB = Upsert.acquireLock(spark, path, 1000)
    tokenA should not be tokenB
    // A's finally-release is a NO-OP against B's lease (the round-5 advice
    // scenario: an unconditional delete here re-opens the table to a third
    // writer while B is mid-swap)
    Upsert.releaseLock(spark, path, tokenA)
    lock.exists() shouldBe true
    // and a third writer still bounces off B's live lease
    val ex = the[Upsert.ConcurrentWriteException] thrownBy
      Upsert.upsert(spark, path, source, Seq("k"))
    ex.getMessage should include("locked by another writer")
    // B's own release works
    Upsert.releaseLock(spark, path, tokenB)
    lock.exists() shouldBe false
  }

  test("lock is released after a failed merge") {
    val path = tmpDir("upsertfail") + "/t"
    Upsert.upsert(spark, path, Seq((1L, "a")).toDF("k", "v"), Seq("k"))
    // schema drift without evolveSchema → merge throws mid-flight
    an[Exception] should be thrownBy
      Upsert.upsert(spark, path, Seq((2L, "b", 7)).toDF("k", "v", "extra"), Seq("k"))
    new java.io.File(path + "__lock").exists() shouldBe false
    // and the table is immediately writable again
    Upsert.upsert(spark, path, Seq((2L, "b")).toDF("k", "v"), Seq("k"))
    spark.read.parquet(path).count() shouldBe 2
  }
}
