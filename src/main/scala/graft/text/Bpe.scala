package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training and application (Sennrich et al.,
  * "Neural Machine Translation of Rare Words with Subword Units", ACL
  * 2016) — the missing third of the tokenizer story next to the pair
  * statistics (q63) and the frequency vocabulary (q105).
  *
  * Classic BPE trains on the WORD-FREQUENCY table, not the raw corpus:
  * one scan builds (word, count) — cardinality = distinct words, the same
  * bounded state every published BPE trainer uses — and each merge round
  * is a pair-count aggregation over that table plus ONE driver-side
  * collect of the single best pair (bounded metadata, like the IVF
  * centroid pull documented in Similarity). Ties break deterministically
  * on (count desc, pair asc) so the merge sequence is reproducible on any
  * engine and partitioning.
  *
  * At 100 TB the word table is capped to the top `maxWords` words by
  * count before training — the standard practice (trainers sample or cap)
  * — so round cost is independent of corpus volume after the first scan.
  */
object Bpe {

  /** Left-fold one merge (a, b) → a+b over a symbol array: scan the
    * array once, gluing the pair wherever the accumulator's tail is `a`
    * and the next symbol is `b` — exactly the sequential merge a
    * single-node BPE applies, expressed as a deterministic Column fold. */
  def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** Apply an ordered merge list to a symbol array (training order —
    * order matters in BPE). Builds one nested expression; fine for the
    * usual few-dozen merges, loop with checkpoints beyond that. */
  def applyMerges(syms: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(syms) { case (c, (a, b)) => applyMerge(c, a, b) }

  /** The word-frequency table BPE trains on: lowercased whitespace words
    * with counts, capped to the top `maxWords` by (count desc, word asc). */
  def wordTable(docs: DataFrame, textCol: String,
                maxWords: Int = 100000): DataFrame = {
    val words = docs
      .select(explode(split(trim(regexp_replace(lower(col(textCol)),
        "\\s+", " ")), " ")).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("wcount"))
    words.orderBy(col("wcount").desc, col("word")).limit(maxWords)
  }

  /** Train `nMerges` BPE merges. Each round: adjacent-pair counts
    * weighted by word frequency (an aggregation over WORD rows), best
    * pair collected to the driver (1 row), merge applied to the symbol
    * arrays. Returns merges in training order. */
  def trainMerges(docs: DataFrame, textCol: String, nMerges: Int,
                  maxWords: Int = 100000): Seq[(String, String)] =
    trainMergesWithTable(docs, textCol, nMerges, maxWords) match {
      // Graph.unpersist, not Dataset.unpersist: the table is a
      // localCheckpoint snapshot (a persisted RDD behind a LogicalRDD
      // leaf) that Dataset.unpersist cannot reach
      case (merges, tbl) => graft.operators.Graph.unpersist(tbl); merges
    }

  /** [[trainMerges]] plus the trained (word, wcount, syms) table — the
    * word table IS the tokenization dictionary after training, so
    * downstream passes broadcast it instead of re-folding merges over
    * every word occurrence in the corpus. Caller unpersists the table. */
  def trainMergesWithTable(docs: DataFrame, textCol: String, nMerges: Int,
                           maxWords: Int = 100000)
      : (Seq[(String, String)], DataFrame) = {
    var tbl = wordTable(docs, textCol, maxWords)
      .withColumn("syms", split(col("word"), ""))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    var done = false
    while (i < nMerges && !done) {
      val pairs = tbl
        .select(col("wcount"), explode(arrays_zip(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1))).as("p"))
        .select(col("p").getField("0").as("a"), col("p").getField("1").as("b"),
          col("wcount"))
        .groupBy("a", "b").agg(sum("wcount").as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      if (pairs.isEmpty) done = true
      else {
        val best = (pairs(0).getString(0), pairs(0).getString(1))
        merges += best
        val next = tbl.withColumn("syms",
          applyMerge(col("syms"), best._1, best._2)).localCheckpoint()
        // release the PREVIOUS round's snapshot RDD (Graph.unpersist —
        // Dataset.unpersist is a no-op on a LogicalRDD-backed checkpoint)
        graft.operators.Graph.unpersist(tbl)
        tbl = next
        i += 1
      }
    }
    (merges.toSeq, tbl)
  }

  /** Corpus subword statistics straight from the trained table: every
    * corpus word is a table row carrying its frequency, so the subword
    * histogram is Σ wcount over exploded symbols — zero additional
    * corpus passes. (Words beyond `maxWords` are outside the trained
    * vocabulary and outside this report, the standard trainer-side cap.) */
  def subwordStats(docs: DataFrame, textCol: String, nMerges: Int,
                   maxWords: Int = 100000): DataFrame = {
    val (_, tbl) = trainMergesWithTable(docs, textCol, nMerges, maxWords)
    tbl.select(explode(col("syms")).as("subword"), col("wcount"))
      .groupBy("subword").agg(sum("wcount").as("n"))
  }

  /** Tokenize a text column with a trained merge list: words → character
    * symbols → merges applied in training order → flat subword array. */
  def tokenize(text: Column, merges: Seq[(String, String)]): Column =
    flatten(transform(
      filter(split(trim(regexp_replace(lower(text), "\\s+", " ")), " "),
        w => w =!= ""),
      w => applyMerges(split(w, ""), merges)))
}
