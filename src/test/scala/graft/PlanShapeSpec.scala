package graft

/** Plan-shape regression tests: the PLANS.md audit claims, enforced.
  * "The optimizer probably broadcast it" is not evidence at 100 TB —
  * these pin the physical shapes the engine's scale story depends on, so
  * a refactor that silently introduces a shuffle or loses a pushdown
  * fails CI, not the cluster. Only hint-forced / data-independent shapes
  * are pinned (AQE-dependent choices would flap with stats). */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** The one suite that reads the driver-provided testdata (plan shapes
    * need realistic parquet scans). Called at the top of every test so
    * its absence CANCELS tests cleanly — an `assume` in the constructor
    * would abort the whole suite during instantiation, which sbt reports
    * as a run failure, not a skip. */
  private def requireData(): Unit =
    assume(new java.io.File(dir).isDirectory, s"$dir not present")

  private def plan(q: String): String = {
    requireData()
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString()
  }

  private def count(hay: String, needle: String): Int =
    needle.r.findAllIn(hay).size

  test("q01 pushes the shipdate filter and prunes the scan schema") {
    val p = plan("q01_pricing_agg")
    p should include("PushedFilters")
    p should include("IsNotNull(l_shipdate)")
    // 11-column lineitem scanned as the 7 referenced columns only
    (p should not).include("l_orderkey")
    p should include("l_returnflag")
  }

  test("q06 flat view: every dim joins broadcast, fact side never shuffles") {
    val p = plan("q06_flat_view")
    count(p, "BroadcastHashJoin") shouldBe 3
    count(p, "SortMergeJoin") shouldBe 0
    count(p, "Exchange hashpartitioning") shouldBe 0
  }

  test("q37 stratified sample is a pure scan predicate — zero exchanges") {
    val p = plan("q37_stratified_sample")
    count(p, "Exchange") shouldBe 0
    // "*(n)" prefixes = whole-stage-codegen stages in executedPlan.toString
    p should include("*(1)")
  }

  test("q01/q16 aggregates are partial-then-final (map-side combine)") {
    for (q <- Seq("q01_pricing_agg", "q16_events_hourly")) {
      val p = plan(q)
      withClue(q) {
        // partial HashAggregate below the exchange, final above it
        count(p, "HashAggregate") should be >= 2
        count(p, "Exchange hashpartitioning") shouldBe 1
      }
    }
  }

  test("custom kernels stay inside whole-stage codegen in q33/q25") {
    for ((q, kernel) <- Seq("q33_fingerprint" -> "doc_fingerprint",
        "q25_simhash_groups" -> "simhash64")) {
      requireData()
      // AQE plans only materialize their codegen stages on execution —
      // inspect the FINAL plan, not the pre-execution skeleton
      val df = SparkEntry.queries(q)(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString()
      withClue(q + "\n" + p) {
        p should include(kernel)
        // the kernel projection sits inside a codegen stage ("*(n)" prefix)
        p.linesIterator.find(_.contains(kernel)).get should include("*(")
      }
    }
  }

  test("q34 IVF: centroid assignment is scan-side, query side broadcasts") {
    val p = plan("q34_ivf_topk")
    count(p, "BroadcastHashJoin") should be >= 1
    count(p, "SortMergeJoin") shouldBe 0
  }
}
