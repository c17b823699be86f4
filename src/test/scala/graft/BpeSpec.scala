package graft

import org.apache.spark.sql.functions._

import graft.text.Bpe

/** BPE training/apply pinned against a single-node reference
  * implementation on the classic word-frequency example, plus the
  * greedy-left-merge semantics on overlapping pairs. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Single-node reference: same tie-break (count desc, pair asc), same
    * greedy left-to-right merge application. */
  private def refApply(syms: List[String], a: String, b: String): List[String] =
    syms.foldLeft(List.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
      else acc :+ x
    }

  private def refTrain(words: Map[String, Long], n: Int): Seq[(String, String)] = {
    var tbl = words.map { case (w, c) => (w.split("").toList, c) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    var done = false
    while (i < n && !done) {
      val pairCounts = tbl.toSeq
        .flatMap { case (syms, c) => syms.zip(syms.drop(1)).map(_ -> c) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      if (pairCounts.isEmpty) done = true
      else {
        val best = pairCounts.minBy { case ((a, b), c) => (-c, a, b) }._1
        out += best
        tbl = tbl.map { case (syms, c) => (refApply(syms, best._1, best._2), c) }
        i += 1
      }
    }
    out.toSeq
  }

  // the classic BPE tutorial corpus
  private val wordFreq = Map("hug" -> 10L, "pug" -> 5L, "pun" -> 12L,
    "bun" -> 4L, "hugs" -> 5L)

  test("trainMerges matches the single-node reference on the classic corpus") {
    val docs = wordFreq.toSeq.flatMap { case (w, c) =>
      Seq.fill(c.toInt)(w) }.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val got = Bpe.trainMerges(docs, "text", nMerges = 6)
    val want = refTrain(wordFreq, 6)
    got shouldBe want
    got.head shouldBe (("u", "g")) // ug appears 10+5+5 = 20 times
  }

  test("tokenize applies merges in training order; greedy left merge on overlaps") {
    val merges = refTrain(wordFreq, 6)
    val toks = Seq((1L, "hugs pun")).toDF("doc_id", "text")
      .select(Bpe.tokenize(col("text"), merges).as("t"))
      .as[Seq[String]].collect()(0)
    val want = refApplyAll("hugs", merges) ++ refApplyAll("pun", merges)
    toks shouldBe want
    // overlapping pair: "aaa" under (a,a) merges greedily left → ["aa", "a"]
    val aa = Seq((1L, "aaa")).toDF("doc_id", "text")
      .select(Bpe.tokenize(col("text"), Seq("a" -> "a")).as("t"))
      .as[Seq[String]].collect()(0)
    aa shouldBe Seq("aa", "a")
  }

  private def refApplyAll(w: String, merges: Seq[(String, String)]): List[String] =
    merges.foldLeft(w.split("").toList) { case (s, (a, b)) => refApply(s, a, b) }

  test("subwordStats equals the reference histogram over the classic corpus") {
    val docs = wordFreq.toSeq.flatMap { case (w, c) =>
      Seq.fill(c.toInt)(w) }.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val got = Bpe.subwordStats(docs, "text", nMerges = 6)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merges = refTrain(wordFreq, 6)
    val want = wordFreq.toSeq
      .flatMap { case (w, c) => refApplyAll(w, merges).map(_ -> c) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    got shouldBe want
  }

  test("trainMerges stops early when no pairs remain") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text") // all 1-char words
    Bpe.trainMerges(docs, "text", nMerges = 5) shouldBe Seq.empty
  }
}
