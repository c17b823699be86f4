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
    val once = Upsert.read(spark, path).collect().map(_.toSeq).toSet
    Upsert.upsert(spark, path, source, Seq("k"))   // replay the same batch
    val twice = Upsert.read(spark, path).collect().map(_.toSeq).toSet
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
    // simulate a pre-versioning crash between the two swap renames: table
    // dir moved aside (recovery must restore it before merging)
    new java.io.File(path).renameTo(new java.io.File(path + "__old")) shouldBe true
    Upsert.upsert(spark, path, source, Seq("k"))
    val out = Upsert.read(spark, path)
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
    Upsert.read(spark, path).columns.sorted shouldBe Array("k", "v")

    // with evolveSchema: new column appears, pre-evolution rows read NULL
    Upsert.upsert(spark, path, drifted, Seq("k"), evolveSchema = true)
    val t = Upsert.read(spark, path)
    t.columns.sorted shouldBe Array("extra", "k", "v")
    t.where($"k" === 2L).select("extra").collect()(0).getInt(0) shouldBe 7
    t.where($"k" === 1L).select("extra").collect()(0).isNullAt(0) shouldBe true

    // a source missing a known column NULL-fills it for replaced rows
    Upsert.upsert(spark, path,
      Seq((1L, 11)).toDF("k", "extra"), Seq("k"), evolveSchema = true)
    val t2 = Upsert.read(spark, path)
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
      Upsert.read(spark, path).count() shouldBe 2 // B wrote nothing
    } finally Upsert.releaseLock(spark, path, tokenA)
    // A released → B's retry wins
    Upsert.upsert(spark, path, source, Seq("k"))
    Upsert.read(spark, path).count() shouldBe 3
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
    Upsert.read(spark, path).count() shouldBe 3
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
    Upsert.read(spark, path).count() shouldBe 2
  }

  test("whole-table upserts commit snapshots: versioned layout, retention, time travel") {
    import graft.sources.Snapshots
    val path = tmpDir("upsertver") + "/t"
    Upsert.upsert(spark, path, target, Seq("k"))
    // versioned from birth: data lives under hidden _versions, pointer set
    Snapshots.isVersioned(spark, path) shouldBe true
    Snapshots.currentVersion(spark, path) shouldBe Some(1L)
    // a plain parquet read sees no data files — the loud failure mode, not
    // silent stale data
    an[Exception] should be thrownBy spark.read.parquet(path).count()
    Upsert.upsert(spark, path, source, Seq("k"))
    Snapshots.currentVersion(spark, path) shouldBe Some(2L)
    // time travel: the pre-merge state is still readable
    Snapshots.read(spark, path, asOf = 1L).count() shouldBe 2
    Upsert.read(spark, path).count() shouldBe 3
    // retention: versions are vacuumed down to DefaultRetainVersions
    (3 to 8).foreach { i =>
      Upsert.upsert(spark, path, Seq((1, s"n$i", i)).toDF("k", "name", "v"), Seq("k"))
    }
    val vs = Snapshots.versions(spark, path)
    vs.size shouldBe Upsert.DefaultRetainVersions
    vs.max shouldBe 8L
  }

  test("a legacy flat table is migrated to the versioned layout on its next merge") {
    import graft.sources.Snapshots
    val path = tmpDir("upsertmig") + "/t"
    target.write.parquet(path) // pre-existing flat table, written out-of-band
    Upsert.upsert(spark, path, source, Seq("k"))
    Snapshots.isVersioned(spark, path) shouldBe true
    val out = Upsert.read(spark, path)
    out.count() shouldBe 3
    out.where($"k" === 2).select("v").collect()(0).getInt(0) shouldBe 99
    // flat files were cleaned after the pointer swap — nothing serves the
    // frozen pre-migration state
    new java.io.File(path).listFiles().map(_.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith(".")) shouldBe empty
  }

  test("readers racing 50 concurrent upserts never see a missing or mixed table") {
    val path = tmpDir("upsertrace") + "/t"
    val keys = (1 to 100)
    def state(v: Int) = keys.map(k => (k, v)).toDF("k", "v")
    Upsert.upsert(spark, path, state(0), Seq("k"))
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      while (!stop.get()) {
        try {
          val rows = Upsert.read(spark, path).collect()
          // atomicity invariant: a snapshot is ALL of one upsert's rows —
          // never a partial file set, never a mix of two versions
          if (rows.length != keys.size)
            failures.add(s"saw ${rows.length} rows")
          val vals = rows.map(_.getInt(1)).distinct
          if (vals.length != 1)
            failures.add(s"mixed versions: ${vals.toSeq.sorted}")
        } catch {
          case e: Exception =>
            failures.add(s"reader error: ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
    })
    reader.start()
    try {
      // 4 writer threads × shared counter to 50 merges, retrying lease
      // contention — the multi-writer shape the lease serializes
      val next = new java.util.concurrent.atomic.AtomicInteger(1)
      val writers = (1 to 4).map { _ =>
        new Thread(() => {
          var i = next.getAndIncrement()
          while (i <= 50) {
            try {
              Upsert.upsert(spark, path, state(i), Seq("k"))
              i = next.getAndIncrement()
            } catch {
              case _: Upsert.ConcurrentWriteException => Thread.sleep(20)
            }
          }
        })
      }
      writers.foreach(_.start())
      writers.foreach(_.join(300000))
    } finally {
      stop.set(true)
      reader.join(30000)
    }
    failures.toArray shouldBe empty
    // the final state is SOME single writer's complete output (threads
    // claim version numbers before racing for the lease, so the last
    // commit is not necessarily #50 — atomicity, not ordering, is the
    // contract under test)
    val end = Upsert.read(spark, path).collect()
    end.length shouldBe keys.size
    val endVals = end.map(_.getInt(1)).distinct
    endVals.length shouldBe 1
    endVals(0) should (be >= 1 and be <= 50)
  }
}
