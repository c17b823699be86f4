package graft

/** Golden-plan regression gate: every `SparkEntry.queries` entry's FINAL
  * (post-AQE) physical plan is profiled — shuffle exchanges, total
  * exchanges, sort-merge joins, broadcast joins — and compared against the
  * committed profile in `PLANS_GOLDEN.txt`. A refactor that silently adds
  * a shuffle or degrades a broadcast join to SMJ fails here, not on the
  * cluster; PLANS.md's audit claims become executable.
  *
  * Regenerate (after an intentional plan change, with the SAME session
  * config this suite runs — plan shapes depend on it):
  *
  * {{{ GRAFT_PLANGOLD_REGEN=1 sbt "testOnly graft.PlanGoldSpec" }}}
  *
  * Counts are deterministic: fixed sf0.001 parquet + fixed session conf →
  * AQE makes the same choices every run. Improvements (fewer exchanges)
  * pass; regenerate to pin the tighter plan.
  */
class PlanGoldSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val goldenFile = new java.io.File("PLANS_GOLDEN.txt")
  private val regen = sys.env.get("GRAFT_PLANGOLD_REGEN").contains("1")

  /** marker name → regex over executedPlan.toString. "exchanges" counts
    * every Exchange (hash/range/broadcast/single); "shuffles" only the
    * hash-partitioning ones that move data across the cluster. */
  private val markers: Seq[(String, String)] = Seq(
    "shuffles" -> "Exchange hashpartitioning",
    // negative lookbehind: ReusedExchange is plan REUSE (good), not a new
    // materialization — counting it would flag reuse as a regression
    "exchanges" -> "(?<!Reused)Exchange",
    "smj" -> "SortMergeJoin",
    "bhj" -> "BroadcastHashJoin")

  private def profile(name: String): Map[String, Int] = {
    val df = SparkEntry.queries(name)(spark, dir)
    // AQE finalizes plans only on execution — materialize every output row
    // (same non-prunable action as Bench), then read the final plan
    df.queryExecution.toRdd.foreach(_ => ())
    // AdaptiveSparkPlan.toString appends the pre-AQE "== Initial Plan =="
    // — count only the final plan or every marker double-counts
    val p = df.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==").head
    markers.map { case (k, pat) => k -> pat.r.findAllIn(p).size }.toMap
  }

  private def parseGolden(): Map[String, Map[String, Int]] =
    scala.io.Source.fromFile(goldenFile).getLines()
      .filter(l => l.nonEmpty && !l.startsWith("#")).map { line =>
        val parts = line.split("\\s+")
        parts.head -> parts.tail.map { kv =>
          val Array(k, v) = kv.split("=", 2); k -> v.toInt
        }.toMap
      }.toMap

  test("no query's physical plan regressed vs the committed golden profile") {
    assume(new java.io.File(dir).isDirectory, s"$dir not present")
    val names = SparkEntry.queries.keys.toSeq.sorted
    if (regen) {
      val lines = Seq(
        "# Golden post-AQE plan profiles at sf0.001 (see PlanGoldSpec).",
        "# Regenerate: GRAFT_PLANGOLD_REGEN=1 sbt \"testOnly graft.PlanGoldSpec\"") ++
        names.map { n =>
          val prof = profile(n)
          n + " " + markers.map { case (k, _) => s"$k=${prof(k)}" }.mkString(" ")
        }
      java.nio.file.Files.write(goldenFile.toPath,
        (lines.mkString("\n") + "\n").getBytes("UTF-8"))
      info(s"regenerated ${goldenFile.getName} for ${names.size} queries")
    } else {
      assert(goldenFile.isFile,
        s"${goldenFile.getName} missing — regenerate with GRAFT_PLANGOLD_REGEN=1")
      val golden = parseGolden()
      val missing = names.filterNot(golden.contains)
      assert(missing.isEmpty,
        s"queries without a golden plan profile (regenerate): ${missing.mkString(", ")}")
      val regressions = names.flatMap { n =>
        val now = profile(n)
        val ref = golden(n)
        // more shuffles / more total exchanges / a new SMJ = regression;
        // fewer is an improvement and passes (regenerate to pin it)
        Seq("shuffles", "exchanges", "smj").collect {
          case k if now(k) > ref(k) =>
            s"$n: $k ${ref(k)} -> ${now(k)}"
        } ++
          // losing a broadcast join (without losing the join itself) means
          // a dim stopped broadcasting — catch it even when AQE turns the
          // replacement SMJ into something else
          (if (now("bhj") < ref("bhj") && now("smj") >= ref("smj"))
             Seq(s"$n: bhj ${ref("bhj")} -> ${now("bhj")}")
           else Nil)
      }
      withClue(regressions.mkString("plan regressions:\n", "\n", "\n")) {
        regressions shouldBe empty
      }
    }
  }
}
