package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy key matching at scale: all pairs of rows whose string keys are
  * within edit distance 1 (one insertion, deletion, or substitution) —
  * near-identical titles, URLs differing by a character, OCR'd or
  * typo'd identifiers. The naive encoding `a JOIN b ON levenshtein(k1,
  * k2) <= 1` is a cross product with a per-pair scalar — quadratic, the
  * same 100 TB cliff as a raw range join.
  *
  * The scalable encoding is the deletion neighborhood (FastSS, Bocek et
  * al. 2007; SymSpell): two strings are within edit distance 1 iff their
  * deletion-1 neighborhoods (the string itself plus every single-character
  * deletion) intersect — a substitution at position i makes both sides
  * equal after deleting i; an insertion/deletion makes one side equal the
  * other's deletion; equality shares the string itself. So: explode each
  * key into its ≤ len+1 variants, hash-join on variant equality, and
  * verify the survivors with one exact `levenshtein` call. Cost: linear
  * fan-out (key length + 1, keys are short by nature and the `maxKeyLen`
  * guard keeps it that way) and ONE equi-join shuffle on the variant
  * string — never a nested loop.
  */
object FuzzyJoin {

  /** Deletion-1 neighborhood of a string: itself + each single-character
    * deletion, deduplicated ("aa" deletes to one "a"). */
  def deletionVariants(c: Column): Column =
    when(length(c) === 0, array(c)).otherwise(
      array_union(
        array(c),
        transform(sequence(lit(1), length(c)),
          i => concat(c.substr(lit(1), i - 1), c.substr(i + 1, length(c))))))

  /** All pairs (id1 < id2) of `df` rows whose `keyCol` values are within
    * edit distance 1. Output: id1, id2, key1, key2. Null keys never match
    * (SQL equality semantics); keys longer than `maxKeyLen` fail LOUDLY —
    * a silently exploding variant fan-out is the failure mode this
    * operator exists to avoid (pre-truncate or hash long keys instead).
    *
    * `maxBucketSize` is the corpus-scale guard (the q118 blocked-ER /
    * LSH maxBucketSize trade, round-9 verdict ask): a variant shared by
    * B keys generates O(B²) candidate pairs, and a single pathological
    * hot key family ("UNKNOWN", "N/A", an OCR artifact) can turn the
    * equi-join quadratic on its own. With a finite cap, variants whose
    * bucket exceeds it are EXCLUDED from pair generation before the
    * self-join (the hot list is heavy-hitters-small and broadcast). The
    * documented recall contract: a pair is lost only if EVERY variant it
    * shares is hot — for edit-distance-1 neighbors that means the keys
    * themselves sit inside a ≥ maxBucketSize near-identical family,
    * where emitting the quadratic pair set is precisely what cannot be
    * afforded; dedup at that density belongs to exact-group operators
    * (hash the key, group, link). Default keeps the join exact. */
  def selfJoinEdit1(df: DataFrame, idCol: String, keyCol: String,
                    maxKeyLen: Int = 128,
                    maxBucketSize: Int = Int.MaxValue): DataFrame = {
    val guarded = df.where(col(keyCol).isNotNull).select(
      col(idCol).as("__id"),
      when(length(col(keyCol)) <= maxKeyLen, col(keyCol))
        .otherwise(raise_error(concat(
          lit(s"fuzzy join: key longer than maxKeyLen=$maxKeyLen chars ("),
          length(col(keyCol)), lit(") — truncate or raise the cap"))))
        .as("__key"))
    // checkpoint: the variants explode feeds the bucket-cap count AND both
    // self-join legs — un-materialized it executes up to three times.
    // Partitioned on __v (the join/aggregate key): the hot-bucket count
    // and BOTH self-join legs then stream the materialized set in place —
    // no per-consumer exchange of the variant rows, and at scale (where
    // neither leg broadcasts) the self-join is exchange-free. The one
    // repartition paid at materialization replaces the 2–3 exchanges the
    // consumers would otherwise each pay.
    val v0 = org.apache.spark.sql.graft.SqlInternals.localCheckpointPartitioned(
      guarded.select(col("__id"), col("__key"),
        explode(deletionVariants(col("__key"))).as("__v")), Seq("__v"))
    val v =
      if (maxBucketSize == Int.MaxValue) v0
      else v0.join(
        broadcast(v0.groupBy("__v").count()
          .where(col("count") > maxBucketSize).select("__v")),
        Seq("__v"), "left_anti")
    // levenshtein verify BEFORE the distinct: pairs sharing several
    // variants are re-verified map-side (cheap, keys are short) so only
    // true matches pay the dedup exchange
    v.as("a").join(v.as("b"),
        col("a.__v") === col("b.__v") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id1"), col("b.__id").as("id2"),
        col("a.__key").as("key1"), col("b.__key").as("key2"))
      .where(levenshtein(col("key1"), col("key2")) <= 1)
      .distinct()
  }
}
