package graft

import org.apache.spark.sql.functions._

import graft.operators.Upsert
import graft.sources.PartitionSnapshots

/** Positional deletes (Iceberg v2's second merge-on-read delete flavor):
  * (file, row-ordinal) delete files committed without rewriting data,
  * applied at read as one broadcast anti-join, materialized by
  * compaction, reaped by vacuum once unreferenced. */
class PositionalDeleteSpec extends SparkSpec {
  import spark.implicits._

  private def rows(path: String): Set[(Int, String, Double)] =
    Upsert.read(spark, path).collect().map(r =>
      (r.getAs[Int]("k"), r.getAs[String]("part"), r.getAs[Double]("v"))).toSet

  test("delete 30% of one file's rows: anti-join by ordinal, no file rewritten") {
    val path = tmpDir("pdel") + "/t"
    // two files in p1 (range-split on k), one in p2
    val seed = (1 to 10).map(i => (i, "p1", i * 1.0)) :+ ((99, "p2", 99.0))
    Upsert.append(spark, path,
      seed.toDF("k", "part", "v").repartitionByRange(2, col("k")),
      Seq("part"))
    val withPos = PartitionSnapshots.readWithRowPos(spark, path)
    withPos.columns should contain allOf ("_pos_path", "_pos_ordinal")
    // pick one file of p1 and doom ~30% of its rows (its first rows)
    val someFile = withPos.where(col("part") === "p1")
      .select(col("_pos_path")).distinct().orderBy(col("_pos_path"))
      .collect().head.getString(0)
    val doomedKeys = withPos
      .where(col("_pos_path") === someFile && col("_pos_ordinal") < 2)
      .collect().map(_.getAs[Int]("k")).toSet
    doomedKeys.size shouldBe 2
    import scala.jdk.CollectionConverters._
    def dataFiles(): Map[String, Long] =
      java.nio.file.Files.walk(java.nio.file.Paths.get(path))
        .iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") &&
          !p.toString.contains("_deletes"))
        .map(p => p.toString ->
          java.nio.file.Files.getLastModifiedTime(p).toMillis).toMap
    val before = dataFiles()
    val vBefore = PartitionSnapshots.currentRootVersion(spark, path).get
    PartitionSnapshots.deletePositions(spark, path,
      withPos.where(col("_pos_path") === someFile && col("_pos_ordinal") < 2)
        .select(col("_pos_path"), col("_pos_ordinal"))) shouldBe true
    // merge-on-read: the doomed rows are gone, every data file untouched
    rows(path).map(_._1) shouldBe (seed.map(_._1).toSet -- doomedKeys)
    dataFiles() shouldBe before
    // the ref is in the committed state, flagged as a positional id
    val state = PartitionSnapshots.rootManifest(spark, path).get
    assert(state("part=p1").contains("+p"),
      s"expected a positional ref on p1, got ${state("part=p1")}")
    // the changelog between the two roots is exactly the deleted rows
    val vAfter = PartitionSnapshots.currentRootVersion(spark, path).get
    val feed = PartitionSnapshots.changes(spark, path, vBefore, vAfter)
    feed.where(col("change_type") === "delete")
      .collect().map(_.getAs[Int]("k")).toSet shouldBe doomedKeys
    feed.where(col("change_type") === "insert").count() shouldBe 0
    // time travel to the pre-delete root still serves the doomed rows
    PartitionSnapshots.read(spark, path, asOf = vBefore)
      .count().toInt shouldBe seed.size
    // rows APPENDED after the delete are never suppressed, even at the
    // same ordinals (the ref rides only the parts that existed then)
    Upsert.append(spark, path,
      Seq((100, "p1", 100.0), (101, "p1", 101.0)).toDF("k", "part", "v"),
      Seq("part"))
    rows(path).map(_._1) should contain allOf (100, 101)
    // $files metadata labels the positional file set
    PartitionSnapshots.filesMeta(spark, path)
      .where(col("content") === "pos_deletes").count() should be >= 1L
  }

  test("compaction materializes positional deletes; vacuum reaps the superseded file") {
    val path = tmpDir("pdelvac") + "/t"
    Upsert.append(spark, path,
      (1 to 8).map(i => (i, "p1", i * 1.0)).toDF("k", "part", "v")
        .repartitionByRange(2, col("k")),
      Seq("part"), retainVersions = 1)
    val withPos = PartitionSnapshots.readWithRowPos(spark, path)
    PartitionSnapshots.deletePositions(spark, path,
      withPos.where(col("k") <= 2).select("_pos_path", "_pos_ordinal"),
      retainVersions = 1) shouldBe true
    val delFile = new java.io.File(s"$path/_deletes")
      .listFiles().map(_.getName).filter(_.startsWith("p"))
    delFile.length shouldBe 1
    // compaction rewrites the delete-pending partition: the state goes
    // PLAIN (ref retired) and the surviving rows are exactly the live set
    PartitionSnapshots.compact(spark, path, minFiles = 4,
      retainVersions = 1).keySet shouldBe Set("part=p1")
    PartitionSnapshots.rootManifest(spark, path)
      .get("part=p1") should not include "+p"
    rows(path).map(_._1) shouldBe (3 to 8).toSet
    // drive the root chain past a rebase so retention drops the roots
    // that still name the id — only then is the positional file reapable
    (1 to PartitionSnapshots.RebaseEvery).foreach { i =>
      Upsert.upsert(spark, path, Seq((8, "p1", 80.0 + i)).toDF("k", "part", "v"),
        Seq("k"), partitionCols = Seq("part"), retainVersions = 1)
    }
    PartitionSnapshots.vacuumDeletes(spark, path)
    new java.io.File(s"$path/_deletes/${delFile.head}").exists() shouldBe false
  }

  test("stale position handles fail loudly after a rewrite") {
    val path = tmpDir("pdelstale") + "/t"
    Upsert.append(spark, path,
      (1 to 4).map(i => (i, "p1", i * 1.0)).toDF("k", "part", "v"),
      Seq("part"))
    // capture handles, then compact the partition away beneath them
    val stale = PartitionSnapshots.readWithRowPos(spark, path)
      .where(col("k") === 1).select("_pos_path", "_pos_ordinal")
      .collect()
    PartitionSnapshots.compact(spark, path, minFiles = 1)
    val staleDf = spark.createDataFrame(
      spark.sparkContext.parallelize(stale.toSeq),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_pos_path",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("_pos_ordinal",
          org.apache.spark.sql.types.LongType))))
    // the file's VERSION dir is gone from the manifest: refuse loudly
    an[Exception] should be thrownBy
      PartitionSnapshots.deletePositions(spark, path, staleDf)
  }
}
