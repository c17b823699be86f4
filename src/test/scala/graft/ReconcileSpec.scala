package graft

import graft.operators.Reconcile

/** Reconciliation: order-insensitive checksum, NULL-safe digests, and
  * keyed diff statuses. */
class ReconcileSpec extends SparkSpec {
  import spark.implicits._

  test("checksum is order- and partitioning-insensitive, NULL-distinguishing") {
    val a = Seq((1L, "x"), (2L, "y"), (3L, null: String)).toDF("k", "v")
    val shuffled = a.orderBy($"k".desc).repartition(7)
    val ca = Reconcile.checksum(a, Seq("k", "v")).collect()(0)
    val cb = Reconcile.checksum(shuffled, Seq("k", "v")).collect()(0)
    ca shouldBe cb
    ca.getLong(0) shouldBe 3L
    // NULL and the literal string "NULL" are different rows
    val c2 = Reconcile.checksum(
      Seq((1L, "x"), (2L, "y"), (3L, "NULL")).toDF("k", "v"), Seq("k", "v"))
      .collect()(0)
    c2.getLong(1) should not be ca.getLong(1)
  }

  test("diff reports added, removed, and changed keys only") {
    val left = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val right = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("k", "v")
    val d = Reconcile.diff(left, right, Seq("k"))
      .as[(Long, String)].collect().toSet
    d shouldBe Set((2L, "changed"), (3L, "removed"), (4L, "added"))
  }
}
