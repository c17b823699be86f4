package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Metadata-scale drill: drive one
  * manifested table to ~100k data files (1k partitions × 100 files) and
  * measure the metadata-path ops — file-scoped MERGE planning, $files,
  * changelog, compaction probe — against a 10× smaller table, to show
  * each op is ≤ ~linear in TOUCHED files (flat vs table size where only
  * metadata volume grows). Scratch main: results land in PLANS.md. */
object MetaDrill {
  def timed[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[drill] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val parts = args.headOption.map(_.toInt).getOrElse(1000)
    val filesPer = args.drop(1).headOption.map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // dynamic-partition writers: 1000 dirs per task
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      // keep the SEED's file fan-out: planned-write would re-shuffle on
      // the partition column and collapse each dir to one file
      .config("spark.sql.optimizer.plannedWrite.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.operators.Upsert
    import graft.sources.PartitionSnapshots

    val base = java.nio.file.Files.createTempDirectory(
      s"drill_${parts}x$filesPer").toString
    val path = s"$base/t"
    println(s"[drill] table=$path parts=$parts filesPer=$filesPer " +
      s"(~${parts * filesPer} files)")

    // rows: 2 per file → tiny data, real file/manifest counts.
    // repartition(filesPer, salt) → each of the `filesPer` tasks writes
    // one file into every partition dir it holds rows for.
    val n = parts * filesPer * 2
    // --range-parts: partition value CORRELATES with the key range (the
    // time-partitioned-fact shape: recent keys → recent partitions), so
    // each partition's manifest key bounds are disjoint and the stats-
    // pruned matched-key lookup can exclude almost everything. Default
    // (id % parts) interleaves keys across partitions — every
    // partition's bounds span the key space, the pruning's worst case.
    val rangeParts = args.contains("--range-parts")
    val df = spark.range(n.toLong).select(
      col("id").cast("long").as("k"),
      (if (rangeParts) (col("id") / (n / parts)).cast("int")
       else (col("id") % parts).cast("int")).as("part"),
      // DECORRELATED from the partition value, so each partition's rows
      // spread over all `filesPer` salts and every task writes into
      // every dir: with range partitions (id/(n/parts)) consecutive ids
      // share a dir → id%filesPer varies within it; with interleaved
      // partitions (id%parts) → (id/parts)%filesPer varies within it
      (if (rangeParts) (col("id") % filesPer)
       else ((col("id") / parts) % filesPer)).cast("int").as("salt"),
      (col("id") * 3L).as("v"))
      .repartition(filesPer, col("salt")).drop("salt")
    timed(s"seed append (${parts * filesPer} files)") {
      Upsert.append(spark, path, df, Seq("part"))
    }
    val fm = timed("$files full listing") {
      PartitionSnapshots.filesMeta(spark, path)
    }
    println("[drill] files rows = " + timed("$files count")(fm.count()))

    // scattered point-key MERGE: 5 single keys in 5 different partitions —
    // file-scoped planning reads ONLY the touched partitions' sidecars
    val keys = Seq(37L, n / 7L, n / 3L, n / 2L, n - 11L)
    timed("5 scattered single-key merges (file-scoped)") {
      keys.foreach { k =>
        val part = if (rangeParts) (k / (n / parts)).toInt
                   else (k % parts).toInt
        timed(s"  merge key=$k") {
          Upsert.upsert(spark, path,
            Seq((k, part, k * 5)).toDF("k", "part", "v"),
            Seq("k"), partitionCols = Seq("part"))
        }
      }
    }
    val head = PartitionSnapshots.currentRootVersion(spark, path).get
    println("[drill] survivors in touched states: " +
      PartitionSnapshots.rootManifest(spark, path).get.values
        .count(_.contains("/")))
    timed("changelog changes(head-1 -> head) count") {
      println("[drill] feed rows = " +
        PartitionSnapshots.changes(spark, path, head - 1, head).count())
    }
    timed("changedPartitions(seed -> head)") {
      println("[drill] changed rels = " +
        PartitionSnapshots.changedPartitions(spark, path, 1L, head).size)
    }
    timed("compaction probe (minFiles above threshold: pure planning)") {
      // minFiles > filesPer+1 → nothing qualifies; measures the probe walk
      println("[drill] compact probe rewrote = " +
        PartitionSnapshots.compact(spark, path,
          minFiles = filesPer + 50).size)
    }
    // round-10 pool drill replication: one merge touching EVERY partition
    if (args.contains("--all-merge")) {
      timed(s"${2 * parts}-key merge touching all $parts partitions") {
        val ks = spark.range(2L * parts).select(
          col("id").as("k"), (col("id") % parts).cast("int").as("part"),
          lit(-1L).as("v"))
        Upsert.upsert(spark, path, ks, Seq("k"), partitionCols = Seq("part"))
      }
    }
    timed("partitionsMeta") {
      println("[drill] partitions = " +
        PartitionSnapshots.partitionsMeta(spark, path).count())
    }
    timed("full read count") {
      println("[drill] rows = " + PartitionSnapshots.read(spark, path).count())
    }
    spark.stop()
  }
}
