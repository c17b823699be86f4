package graft

import org.apache.spark.sql.functions._
import graft.functions.Sketches
import graft.operators.{FuzzyJoin, Profile}
import graft.text.TextAnalysis

/** KMV distinct sketch, fuzzy (edit-distance-1) join, diacritic folding,
  * and the one-scan profiling operators. */
class SketchProfileSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int, distinct: Int) =
    (0 until n).map(i => (i.toLong, s"doc text number ${i % distinct}"))
      .toDF("id", "text")

  test("kmv sketch equals the k smallest distinct hashes, any partitioning") {
    val k = 16
    val df = docs(500, 120)
    val viaAgg = df.repartition(7) // force a multi-partition merge path
      .agg(Sketches.kmvSketch(Sketches.hash63($"text"), k).as("sk"))
      .head().getSeq[Long](0)
    // ground truth: sort ALL distinct hashes, take the bottom k
    val truth = df.select(Sketches.hash63($"text").as("h")).distinct()
      .orderBy($"h").limit(k).collect().map(_.getLong(0)).toSeq
    viaAgg shouldBe truth
    // partitioning-invariant: a different layout yields the identical sketch
    val other = df.repartition(3, $"id")
      .agg(Sketches.kmvSketch(Sketches.hash63($"text"), k).as("sk"))
      .head().getSeq[Long](0)
    other shouldBe viaAgg
  }

  test("kmv under-filled sketch IS the distinct set; estimate is then exact") {
    val k = 64
    val df = docs(200, 20) // 20 distinct < k
    val out = df.agg(Sketches.kmvSketch(Sketches.hash63($"text"), k).as("sk"))
      .select(org.apache.spark.sql.functions.size($"sk").as("n"),
        Sketches.kmvEstimate($"sk", k).as("est"))
      .head()
    out.getInt(0) shouldBe 20
    out.getDouble(1) shouldBe 20.0
  }

  test("kmv estimate lands within the sketch's error bounds") {
    val k = 256
    val exact = 2000
    val df = docs(5000, exact)
    val est = df.agg(Sketches.kmvSketch(Sketches.hash63($"text"), k).as("sk"))
      .select(Sketches.kmvEstimate($"sk", k)).head().getDouble(0)
    // stderr ≈ 1/√(k−2) ≈ 6.3%; assert a generous 4σ envelope
    math.abs(est - exact) / exact should be < 0.25
  }

  test("fuzzy join finds exactly the edit-distance-1 pairs") {
    val names = Seq(
      (1L, "kitten"), (2L, "kitte"),   // deletion
      (3L, "kittens"),                 // insertion vs 1
      (4L, "mitten"),                  // substitution vs 1
      (5L, "kitten"),                  // exact duplicate of 1
      (6L, "sitting"),                 // distance 5 from kitten — no match
      (7L, "x"), (8L, ""),             // 1-char ↔ empty = one deletion
      (9L, "completely different")
    ).toDF("id", "name")
    val got = FuzzyJoin.selfJoinEdit1(names, "id", "name")
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force ground truth over the same rows
    val truth = names.as("a").join(names.as("b"),
        col("a.id") < col("b.id") &&
          levenshtein(col("a.name"), col("b.name")) <= 1)
      .select(col("a.id"), col("b.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe truth
    got should contain allOf ((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (7L, 8L))
    got.exists(p => p._1 == 6L || p._2 == 6L) shouldBe false
    got.exists(p => p._1 == 9L || p._2 == 9L) shouldBe false
    // null keys never match; over-long keys fail loudly
    val withNull = names.unionByName(
      Seq((10L, null.asInstanceOf[String])).toDF("id", "name"))
    FuzzyJoin.selfJoinEdit1(withNull, "id", "name")
      .where($"id1" === 10L || $"id2" === 10L).count() shouldBe 0
    val e = intercept[Exception] {
      FuzzyJoin.selfJoinEdit1(names, "id", "name", maxKeyLen = 5).collect()
    }
    e.getMessage should include("fuzzy join")
  }

  test("fuzzy join hot-bucket cap drops only pairs inside the hot family") {
    // a pathological near-identical family ("dup") of 40 keys would emit
    // C(40,2) = 780 pairs; with the cap its shared variants are excluded
    // and the quadratic family is dropped, while ordinary pairs —
    // including one INVOLVING no hot variant overlap — survive exactly
    val hot = (1L to 40L).map(i => (i, "dup"))
    val cool = Seq((100L, "kitten"), (101L, "kitte"), (102L, "mitten"))
    val df = (hot ++ cool).toDF("id", "name")
    val capped = FuzzyJoin.selfJoinEdit1(df, "id", "name", maxBucketSize = 10)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    capped shouldBe Set((100L, 101L), (100L, 102L))
    // default = exact: the full quadratic family is emitted
    FuzzyJoin.selfJoinEdit1(df, "id", "name")
      .count() shouldBe (40L * 39 / 2 + 2)
  }

  test("diacritic fold and slug reproduce the reference's topic-slug shapes") {
    val vn = Seq("Thời sự", "Đường phố Hà Nội", "GIÁO DỤC – Đào tạo", "plain ascii")
      .toDF("s")
    val out = vn.select(TextAnalysis.foldDiacritics($"s").as("f"),
      TextAnalysis.slug($"s").as("slug")).collect()
    out.map(_.getString(0)) shouldBe
      Array("thoi su", "duong pho ha noi", "giao duc – dao tao", "plain ascii")
    out.map(_.getString(1)) shouldBe
      Array("thoi-su", "duong-pho-ha-noi", "giao-duc-dao-tao", "plain-ascii")
    // the fold map is 1:1 (translate() pairs chars positionally)
    TextAnalysis.VnFrom.length shouldBe TextAnalysis.VnTo.length
  }

  test("histogram clamps outliers into edge bins and drops nulls") {
    val vals = Seq[Option[Double]](Some(-5.0), Some(0.0), Some(9.9), Some(10.0),
      Some(55.0), Some(99.9), Some(100.0), Some(250.0), None).toDF("x")
    val out = Profile.histogram(vals, "x", lo = 0.0, hi = 100.0, bins = 10)
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    out(0) shouldBe 3  // -5 clamped in, 0.0, 9.9
    out(1) shouldBe 1  // 10.0 (left-closed bins)
    out(5) shouldBe 1  // 55
    out(9) shouldBe 3  // 99.9, plus 100.0 and 250.0 clamped into the top bin
    out.values.sum shouldBe 8 // the null never counts
    val edges = Profile.histogram(vals, "x", 0.0, 100.0, 10)
      .where($"bin" === 5).head()
    edges.getDouble(1) shouldBe 50.0
    edges.getDouble(2) shouldBe 60.0
  }

  test("summarize profiles every column in one pass with exact decimal sums") {
    val df = Seq((1L, Some(10.5)), (2L, Some(20.25)), (3L, None))
      .toDF("k", "v")
    val out = Profile.summarize(df, Seq("k", "v"))
      .collect().map(r => r.getString(0) -> r).toMap
    val k = out("k")
    k.getLong(1) shouldBe 3; k.getLong(2) shouldBe 0
    k.getDouble(3) shouldBe 1.0; k.getDouble(4) shouldBe 3.0
    k.getDouble(5) shouldBe 6.0; k.getDouble(6) shouldBe 2.0
    val v = out("v")
    v.getLong(1) shouldBe 2; v.getLong(2) shouldBe 1
    v.getDouble(5) shouldBe 30.75; v.getDouble(6) shouldBe 15.375
    // one scan: the wide aggregate never unions per-column legs
    Profile.summarize(df, Seq("k", "v"))
      .queryExecution.executedPlan.toString should not include "Union"
  }

  test("snapshotDrift flags relative mean shifts and zero-mean edge cases") {
    val from = Seq((1, 100.0, 0.0), (2, 100.0, 0.0)).toDF("k", "a", "z")
    val shifted = Seq((1, 120.0, 0.0), (2, 100.0, 0.0)).toDF("k", "a", "z")
    val out = Profile.snapshotDrift(from, shifted, Seq("a", "z"), relTol = 0.05)
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    // a: mean 100 → 110, rel delta 0.10 > 0.05 → drift
    out("a").getAs[Double]("mean_rel_delta") shouldBe 0.10 +- 1e-12
    out("a").getAs[Boolean]("mean_drift") shouldBe true
    // z: zero means on both sides — no spurious division, no drift
    out("z").isNullAt(out("z").fieldIndex("mean_rel_delta")) shouldBe true
    out("z").getAs[Boolean]("mean_drift") shouldBe false
    // zero from-mean with a nonzero to-mean IS drift (rel delta undefined)
    val zeroTo = Seq((1, 100.0, 5.0), (2, 100.0, -3.0)).toDF("k", "a", "z")
    val out2 = Profile.snapshotDrift(from, zeroTo, Seq("z"))
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    out2("z").getAs[Boolean]("mean_drift") shouldBe true
    // within tolerance → quiet
    val tiny = Seq((1, 101.0, 0.0), (2, 100.0, 0.0)).toDF("k", "a", "z")
    Profile.snapshotDrift(from, tiny, Seq("a")).collect()
      .head.getAs[Boolean]("mean_drift") shouldBe false
  }
}
