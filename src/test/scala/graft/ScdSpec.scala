package graft

import java.sql.Timestamp

import graft.operators.Scd
import org.apache.spark.sql.functions._

/** SCD type-2 build: run collapsing, version numbering, effective ranges,
  * null-safe change detection, and the single-exchange plan shape. */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val log = Seq(
    // key 1: A, A, B, A — 3 versions (the second A is a NEW run)
    (1L, 10L, ts("2024-01-01 00:00:00"), "A"),
    (1L, 11L, ts("2024-01-02 00:00:00"), "A"),
    (1L, 12L, ts("2024-01-03 00:00:00"), "B"),
    (1L, 13L, ts("2024-01-04 00:00:00"), "A"),
    // key 2: single row
    (2L, 20L, ts("2024-02-01 00:00:00"), "X")
  ).toDF("k", "seq", "t", "status")

  test("consecutive identical attrs collapse into one version with ranges") {
    val out = Scd.scd2(log, "k", "t", "seq", Seq("status"))
      .as[(Long, String, Int, Timestamp, Option[Timestamp], Boolean)]
      .collect().sortBy(r => (r._1, r._3))
    out.map(r => (r._1, r._2, r._3)) shouldBe Array(
      (1L, "A", 1), (1L, "B", 2), (1L, "A", 3), (2L, "X", 1))
    val k1 = out.filter(_._1 == 1L)
    k1.map(_._4) shouldBe Array(ts("2024-01-01 00:00:00"),
      ts("2024-01-03 00:00:00"), ts("2024-01-04 00:00:00"))
    // effective_to chains exactly to the next version's from
    k1.map(_._5) shouldBe Array(Some(ts("2024-01-03 00:00:00")),
      Some(ts("2024-01-04 00:00:00")), None)
    out.filter(_._6).map(r => (r._1, r._3)).toSet shouldBe Set((1L, 3), (2L, 1))
  }

  test("NULL attr values are null-safe: NULL->NULL is no change, A->NULL is") {
    val l = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), null: String),
      (1L, 2L, ts("2024-01-02 00:00:00"), null: String),
      (1L, 3L, ts("2024-01-03 00:00:00"), "A")
    ).toDF("k", "seq", "t", "status")
    val out = Scd.scd2(l, "k", "t", "seq", Seq("status"))
      .select("version", "status").as[(Int, Option[String])]
      .collect().sortBy(_._1)
    out shouldBe Array((1, None), (2, Some("A")))
  }

  test("same-ts rows order by the tie-break, so versioning is deterministic") {
    val t0 = ts("2024-01-01 00:00:00")
    val l = Seq((1L, 2L, t0, "B"), (1L, 1L, t0, "A")).toDF("k", "seq", "t", "status")
    val out = Scd.scd2(l, "k", "t", "seq", Seq("status"))
      .select("version", "status").as[(Int, String)].collect().sortBy(_._1)
    out shouldBe Array((1, "A"), (2, "B"))
  }

  test("whole build is a single hash exchange on the key") {
    val p = Scd.scd2(log, "k", "t", "seq", Seq("status"))
      .queryExecution.executedPlan.toString()
    "Exchange hashpartitioning".r.findAllIn(p).size shouldBe 1
  }

  test("idempotent over a re-delivered log (dup rows collapse into same runs)") {
    val redelivered = log.unionByName(log.limit(3))
    // dedup on the natural key first — the upsert path's own discipline
    val out = Scd.scd2(redelivered.dropDuplicates("k", "seq"), "k", "t", "seq",
      Seq("status")).collect()
    out.length shouldBe 4
  }
}
