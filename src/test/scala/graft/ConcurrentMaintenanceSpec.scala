package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Upsert
import graft.sources.PartitionSnapshots
import graft.streaming.Streams

/** CONCURRENT MAINTENANCE — the real ops mode the pieces individually
  * support, exercised TOGETHER on one table (round-12 verdict ask): a
  * streaming ingest (exactly-once optimistic appends) runs while a
  * maintenance loop interleaves SORTED COMPACTION and ORPHAN SWEEPS.
  * Every op takes the same writer lease, so interleavings serialize at
  * commit granularity; maintenance retries lease conflicts with backoff
  * (the documented ops pattern — the stream holds the lease only for
  * its metadata-speed commit). Pins: the stream stays exactly-once
  * (every fed row lands once, txn stamp intact), the sweep removes the
  * injected crash debris and NOTHING live, compaction's survivors keep
  * the content byte-equal, and a full-history changelog replay still
  * nets to the final image across the mixed chain. */
class ConcurrentMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("streaming appends + sorted compaction + orphan sweep interleave safely") {
    val base = tmpDir("cmaint")
    val path = s"$base/t"
    Upsert.upsert(spark, path,
      Seq((1, "p1", 10), (2, "p2", 20)).toDF("k", "part", "v"),
      Seq("k"), partitionCols = Seq("part"), partitionManifests = true)
    // a crashed writer's debris, aged past the sweep TTL: a sealed but
    // never-rooted version slot and an abandoned staging root
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val orphanSlot = s"$path/part=p1/_versions/v00000077"
    Seq((99, "p1", 99)).toDF("k", "part", "v").coalesce(1)
      .write.parquet(orphanSlot)
    fs.create(new org.apache.hadoop.fs.Path(s"$orphanSlot/_SUCCESS"), true)
      .close()
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$path/_staging-crashed"))
    val old = System.currentTimeMillis() - 48L * 3600 * 1000
    Seq(orphanSlot, s"$path/_staging-crashed").foreach(p =>
      fs.setTimes(new org.apache.hadoop.fs.Path(p), old, -1))

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Int, String, Int)]
    val q = Streams.manifestedAppendStream(spark,
      mem.toDF().toDF("k", "part", "v"), path, Seq("part"),
      tmpDir("cmaintck"), appId = Some("cmaint"))
    // a LIVE CDC consumer rides along the whole run (the realistic
    // shape: a fresh full-history replay would ask for roots retention
    // already expired — and refuses loudly; a live stream's floor
    // advances with its drains, the no-wedge contract)
    val feedName = "cmaint_feed"
    val consumer = Streams.changelogStream(spark, path,
        startingVersion = Some(1L))
      .writeStream.format("memory").queryName(feedName)
      .option("checkpointLocation", tmpDir("cmaintfck")).start()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val swept = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val compacted = new java.util.concurrent.atomic.AtomicInteger()
    @volatile var stopMaint = false
    def retrying(what: String)(op: => Unit): Unit = {
      var attempts = 0
      var done = false
      while (!done && attempts < 60) {
        try { op; done = true }
        catch {
          case _: Upsert.ConcurrentWriteException =>
            attempts += 1; Thread.sleep(50) // stream holds the lease; back off
          case t: Throwable => errs.add(new RuntimeException(what, t)); done = true
        }
      }
      if (!done) errs.add(new RuntimeException(s"$what: never got the lease"))
    }
    val maint = new Thread(() => {
      var i = 0
      while (!stopMaint) {
        if (i % 2 == 0)
          retrying("compact")(compacted.addAndGet(
            PartitionSnapshots.compact(spark, path, minFiles = 2,
              sortWithin = Seq("k")).size))
        else
          retrying("sweep")(PartitionSnapshots.removeOrphans(spark, path)
            .foreach(swept.add))
        i += 1
        Thread.sleep(30)
      }
    })
    maint.start()
    try {
      // 8 micro-batches raced against the maintenance loop; the CDC
      // consumer drains after each so its floor outruns retention
      for (b <- 0 until 8) {
        mem.addData((100 + b, if (b % 2 == 0) "p1" else "p2", b))
        q.processAllAvailable()
        consumer.processAllAvailable()
      }
    } finally {
      stopMaint = true
      maint.join(120000)
      q.stop()
    }
    assert(errs.isEmpty, s"maintenance/stream errors: $errs")
    // exactly-once: seed + the 8 streamed rows, each exactly once
    val got = Upsert.read(spark, path).select("k").collect()
      .map(_.getInt(0)).sorted
    got shouldBe (Seq(1, 2) ++ (100 until 108)).sorted.toArray
    // the sweep ran and removed the injected debris — and nothing live
    import scala.jdk.CollectionConverters._
    val sweptAll = swept.asScala.toSeq
    assert(sweptAll.exists(_.contains("v00000077")),
      s"sweep never removed the injected orphan slot (swept: $sweptAll)")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(orphanSlot)))
    // compaction really interleaved with the stream
    assert(compacted.get() > 0, "compaction never rewrote anything")
    // the mixed chain still replays: the LIVE consumer's accumulated
    // full-history feed nets to the final image (the replay-matrix
    // invariant, across ingest + compaction + sweeps interleaved)
    try consumer.processAllAvailable() finally consumer.stop()
    val feed = spark.table(feedName)
    val dataCols = feed.columns
      .filterNot(Set("change_type", "_commit_version").contains).toSeq
    val net = feed.groupBy(dataCols.map(col): _*)
      .agg(sum(when(col("change_type") === "insert", 1).otherwise(-1))
        .as("__n")).where(col("__n") > 0).drop("__n")
    val expected = Upsert.read(spark, path)
    net.select(expected.columns.map(col).toSeq: _*).collect()
      .map(_.toSeq).toSet shouldBe expected.collect().map(_.toSeq).toSet
  }
}
