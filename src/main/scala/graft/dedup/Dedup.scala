package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.FastExprs
import graft.text.TextAnalysis.{portableHash, tokens}

/** Deduplication operators for training-data pipelines.
  *
  * Techniques are the published standards: MinHash resemblance sketches
  * (Broder, "On the resemblance and containment of documents", 1997) with
  * banded LSH bucketing (Indyk & Motwani 1998; the banding analysis as in
  * Mining of Massive Datasets ch. 3), SimHash (Charikar, "Similarity
  * estimation techniques from rounding algorithms", STOC 2002), and exact
  * digest dedup.
  *
  * Scale design notes (the point of each variant):
  *  - exact: one hash-shuffle on a 64-bit digest of the normalized text —
  *    never shuffles full document bodies, only (digest, id).
  *  - MinHash+LSH: signatures are computed scan-side (per-row column
  *    algebra, no shuffle); the only shuffle is the band-bucket groupBy,
  *    whose cardinality is #docs×#bands regardless of corpus width. Pairs
  *    are generated per-bucket — the classic way to keep near-dup detection
  *    out of O(n²) at 100 TB.
  *  - SimHash: one 32-bit sketch per doc; candidates = equal sketch (or
  *    banded sketch bytes for hamming≤k) — a single groupBy.
  *  - n-gram Jaccard: exact verification — only run on candidate pairs or
  *    capped subsets, never the full cross product.
  *  - embedding cosine: quantized int vectors → exact, reproducible
  *    arithmetic (float sums are not associative; int sums are).
  */
object Dedup {

  /** Normalized-text digest used by exact dedup: collapse whitespace,
    * lowercase, then xxhash64 (Spark-native, 1 cheap pass). */
  def textDigest(text: Column): Column =
    xxhash64(lower(trim(regexp_replace(text, "\\s+", " "))))

  /** Exact dedup: keep the lowest-id document per normalized text digest.
    * Returns (keep_id, dup_count, digest) groups. */
  def exactGroups(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame =
    docs.groupBy(textDigest(col(textCol)).as("digest"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Exact dedup: the surviving rows. min-id-wins via a single aggregation
    * + self-semi-join on (digest, id) — no window needed, and the join key
    * is the digest, so AQE can broadcast the small winners side. */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val winners = exactGroups(docs, idCol, textCol)
      .select(col("digest"), col("keep_id").as(idCol))
    docs.withColumn("digest", textDigest(col(textCol)))
      .join(winners, Seq("digest", idCol), "left_semi")
      .drop("digest")
  }

  /** w-token shingles of the text, distinct (first-occurrence order).
    * Codegen'd single pass ([[graft.functions.ShinglesExpr]]). */
  def shingles(text: Column, w: Int = 3): Column = FastExprs.shingles(text, w)

  /** Column-algebra reference implementation of [[shingles]] — kept as the
    * element-identity witness for the spec; interpreted slice+concat per
    * gram, never use on a hot path. */
  def shinglesColumn(text: Column, w: Int = 3): Column = {
    val toks = tokens(text)
    array_distinct(
      when(size(toks) >= w,
        transform(sequence(lit(0), size(toks) - lit(w)),
          i => concat_ws(" ", slice(toks, i + 1, lit(w)))))
      .otherwise(array(concat_ws(" ", toks))))
  }

  // ---- MinHash + LSH ----

  /** Hash-family constants — single source of truth in
    * [[graft.functions.MinHashSignatureExpr]]; the Column path, the codegen
    * path, and the generated oracle SQL all read the same values. */
  val MinHashPrime: Long = graft.functions.MinHashSignatureExpr.Prime
  private def coeffA(i: Int): Long = graft.functions.MinHashSignatureExpr.coeffA(i)
  private def coeffB(i: Int): Long = graft.functions.MinHashSignatureExpr.coeffB(i)

  /** MinHash signature: for each of k hash functions, the min over shingle
    * hashes of (a_i*h + b_i) mod p. `portable=true` uses the md5-digit hash
    * (reproducible in any engine); false uses xxhash64 (faster). */
  def minHashSignature(shingleArr: Column, k: Int = 16, portable: Boolean = false): Column = {
    val baseHash: Column => Column =
      if (portable) portableHash else (c: Column) => pmod(xxhash64(c), lit(MinHashPrime))
    val hashed = transform(shingleArr, s => baseHash(s))
    array((0 until k).map { i =>
      array_min(transform(hashed, h => pmod(h * lit(coeffA(i)) + lit(coeffB(i)), lit(MinHashPrime))))
    }: _*)
  }

  /** LSH candidate pairs: band the signature (bands × rowsPerBand = k),
    * bucket on xxhash64(band, band slice) — a dense 64-bit join key, so the
    * self-join shuffles longs instead of arrays — and emit intra-bucket
    * pairs id1<id2, distinct across bands.
    *
    * `portable=false` (default) computes signatures with the codegen'd
    * [[graft.functions.MinHashSignatureExpr]] — bit-identical to the
    * Column-algebra path but one compiled pass per row instead of
    * k interpreted lambda sweeps. */
  def minHashCandidates(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text", w: Int = 3, k: Int = 16,
                        bands: Int = 4, portable: Boolean = false,
                        maxBucketSize: Int = 10000): DataFrame = {
    val rows = k / bands
    val sig = docs.select(col(idCol),
      FastExprs.minHashSignature(col(textCol), w, k, portable).as("sig"))
    val banded = sig.select(col(idCol), posexplode(
      transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"), slice(col("sig"), b * rows + 1, lit(rows)).as("slice")))))
      .select(col(idCol), xxhash64(col("col.band"), col("col.slice")).as("bucket"))
    // Bucket-size guard AND pair generation in ONE aggregate: each bucket
    // collects its sorted id array, singleton buckets can't pair and
    // template-collision buckets above maxBucketSize drop (documented
    // recall trade; a >maxBucketSize bucket means near-identical
    // boilerplate that exact dedup or a tighter band width should handle
    // instead). Ordered pairs then explode POSITIONALLY from the sorted
    // array (ascending ⇒ id1 < id2 by position) — the old shape paid a
    // corpus-wide count window, a checkpoint, and a self-join whose two
    // legs each re-exchanged the guarded rows just to filter k² down to
    // C(k,2).
    val buckets = banded.groupBy("bucket")
      .agg(sort_array(collect_list(col(idCol))).as("ids"))
      .where(size(col("ids")).between(2, maxBucketSize))
    // two-step explode: (i, id1) rows first, then the tail slice — never
    // materializes a bucket's full C(k,2) pair array in one row (a
    // maxBucketSize bucket would otherwise build a 50M-struct array)
    buckets
      .select(posexplode(col("ids")).as(Seq("i", "id1")), col("ids"))
      .select(col("id1"), explode(slice(col("ids"), col("i") + lit(2),
        size(col("ids")) - col("i") - 1)).as("id2"))
      .select("id1", "id2").distinct()
  }

  /** Exact Jaccard over w-shingle sets for given (id1,id2) pairs. Only the
    * documents that actually appear in a pair are shingled (semi-join
    * first) — at corpus scale the candidate set is orders of magnitude
    * smaller than the corpus. */
  def jaccardVerify(docs: DataFrame, pairs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text", w: Int = 3): DataFrame = {
    val ids = pairs.select(col("id1").as(idCol))
      .unionByName(pairs.select(col("id2").as(idCol))).distinct()
    // checkpoint: the shingle arrays feed BOTH pair joins — otherwise the
    // semi-join + shingling kernel runs once per leg. Sorted ONCE PER DOC
    // here so the per-PAIR verify below is a single merge walk
    // (sorted_jaccard_counts) instead of two hash-set builds — pairs
    // outnumber docs, so the sort amortizes.
    val sh = org.apache.spark.sql.graft.SqlInternals.localCheckpointSized(
      docs.join(ids, Seq(idCol), "left_semi")
        .select(col(idCol),
          sort_array(shingles(col(textCol), w)).as("sh")))
    pairs
      .join(sh.select(col(idCol).as("id1"), col("sh").as("sh1")), Seq("id1"))
      .join(sh.select(col(idCol).as("id2"), col("sh").as("sh2")), Seq("id2"))
      .withColumn("__jc",
        graft.functions.FastExprs.sortedJaccardCounts(col("sh1"), col("sh2")))
      .select(col("id1"), col("id2"),
        (col("__jc.inter").cast("double") / col("__jc.uni")).as("jaccard"))
  }

  /** EXACT set-similarity self-join: all pairs with token-set Jaccard ≥
    * tNum/tDen, via prefix filtering (Chaudhuri et al. ICDE 2006; Vernica
    * et al. SIGMOD 2010 is the MapReduce formulation) — the exact
    * companion to MinHash-LSH when the threshold is a hard contract, not
    * a recall target. The threshold is a RATIONAL so the verify is pure
    * integer arithmetic: tDen·|∩| ≥ tNum·|∪| — no float boundary, the
    * identical pair set on every engine.
    *
    * Prefix lemma: order every set by (df asc, token) — rarest first,
    * globally consistent — and emit only each set's first
    * |s| − ⌈t·|s|⌉ + 1 tokens as join keys. Any pair with Jaccard ≥ t
    * must share a PREFIX token (|∩| ≥ ⌈t·max(|x|,|y|)⌉; a pair avoiding
    * both prefixes has |∩| ≤ min(⌈t|x|⌉, ⌈t|y|⌉) − 1 — contradiction), so
    * filtering has NO false negatives. Rare-first ordering makes prefix
    * join keys low-frequency — the candidate join fans out on rare
    * tokens, not stop words.
    *
    * Scale shape: candidates carry (id, id) pairs only (token arrays are
    * re-joined by id AFTER candidate dedup); the length filter
    * tNum·max(|x|,|y|) ≤ tDen·min(|x|,|y|) prunes before any array
    * materializes twice. */
  def setSimJoin(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text", w: Int = 3, tNum: Int = 1,
                 tDen: Int = 2): DataFrame = {
    require(tNum > 0 && tDen >= tNum,
      s"setSimJoin: threshold $tNum/$tDen must be in (0, 1]")
    // w-shingle sets, not bare tokens: on templated corpora nearly every
    // doc pair shares most TOKENS (measured: 59% of all pairs pass 0.6
    // token-Jaccard on the testdata — a quadratic output), while shingle
    // similarity is the sparse near-dup signal the dedup family already
    // verifies against (q24/q26/q58 semantics).
    // Shingles are digested to 64-bit hashes ONCE scan-side: the df
    // aggregate and the prefix join shuffle 8-byte longs, never shingle
    // text; a hash collision can only ADD a candidate (verify is on the
    // exact string sets), never lose one. Checkpointed: the stream feeds
    // both the df count and the ordered-set build.
    val els = docs.select(col(idCol).as("id"),
        explode(shingles(col(textCol), w)).as("tok"))
    setSimJoinOnElems(els, tNum, tDen)
  }

  /** [[setSimJoin]]'s engine over an arbitrary (id, tok) element frame —
    * also the core of [[blockedErJoin]], whose elements carry the blocking
    * key inside the string. Same prefix + positional filtering, same
    * integer rational threshold. */
  private def setSimJoinOnElems(elems: DataFrame, tNum: Int, tDen: Int): DataFrame = {
    val els = elems
      .withColumn("h", xxhash64(col("tok")))
      .localCheckpoint()
    val dfc = els.groupBy("h").agg(count(lit(1)).as("df"))
    // feeds the prefix explode AND both verify legs — materialized once
    // (ContextCleaner frees it with the result), not re-aggregated 3×.
    // tks is STRING-sorted (not (df,h,tok)-sorted like hks): the verify
    // intersects it with one merge walk per pair (sorted_jaccard_counts)
    // instead of a hash-set build — the prefix math only reads hks/sz,
    // which keep the rare-first order.
    val ordered = els.join(dfc, "h")
      .groupBy("id")
      .agg(array_sort(collect_list(struct(col("df"), col("h"), col("tok"))))
        .as("st"))
      .select(col("id"),
        sort_array(transform(col("st"), s => s.getField("tok"))).as("tks"),
        transform(col("st"), s => s.getField("h")).as("hks"),
        size(col("st")).as("sz"))
      .localCheckpoint()
    // prefix length: |s| − ⌈t·|s|⌉ + 1, integer ceiling
    val pfx = ordered.select(col("id"), col("sz"),
      posexplode(slice(col("hks"), lit(1),
        (col("sz") - expr(s"(sz * $tNum + ${tDen - 1}) div $tDen") + 1)
          .cast("int"))).as(Seq("pos", "h")))
    // PPJoin positional filter (Xiao et al. WWW 2008): a match at
    // 0-based positions (p1, p2) bounds the overlap by
    // 1 + min(s1−p1−1, s2−p2−1) + p? — conservatively 1 + min(s1−p1,
    // s2−p2) remaining elements; pairs that cannot reach the required
    // overlap α = ⌈t/(1+t)·(s1+s2)⌉ die IN the join, before the distinct
    // — on templated corpora this is the difference between candidate
    // volume tracking the ANSWER size vs the shared-shingle fan-out.
    // ⌈a/d⌉ as (a + d−1) div d — pure integer, no double round-trip
    val alpha =
      expr(s"(($tNum * (s1 + s2)) + ${tNum + tDen - 1}) div ${tNum + tDen}")
    val cand = pfx.select(col("id").as("id1"), col("sz").as("s1"),
        col("pos").as("p1"), col("h"))
      .join(pfx.select(col("id").as("id2"), col("sz").as("s2"),
        col("pos").as("p2"), col("h")), "h")
      .where(col("id1") < col("id2") &&
        greatest(col("s1"), col("s2")) * tNum <=
          least(col("s1"), col("s2")) * tDen &&
        lit(1) + least(col("s1") - col("p1") - 1, col("s2") - col("p2") - 1)
          >= alpha)
      .select("id1", "id2").distinct()
      // AQE sizes the distinct's reader by BYTES — a few MB of (id, id)
      // pairs coalesce to ONE partition, serializing the verify stage
      // whose per-row cost is an array_intersect over full token arrays
      // (measured: a 4.2 s single-task tail). An explicit-count hash
      // repartition (AQE never coalesces REPARTITION_BY_NUM) restores
      // compute parallelism at every scale. Keyed on id1 ALONE: keyed on
      // (id1, id2) it would duplicate the distinct's partitioning and be
      // pruned as redundant, putting the 1-partition AQE read back.
      .repartition(elems.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "200").toInt, col("id1"))
    // one merge walk per candidate pair over the string-sorted sets —
    // |∩| and |∪| together, no per-pair hash table
    val jc = graft.functions.FastExprs.sortedJaccardCounts(col("t1"), col("t2"))
    val inter = col("__jc.inter")
    val uni = col("__jc.uni")
    cand
      .join(ordered.select(col("id").as("id1"), col("tks").as("t1"),
        col("sz").as("s1")), Seq("id1"))
      .join(ordered.select(col("id").as("id2"), col("tks").as("t2"),
        col("sz").as("s2")), Seq("id2"))
      .withColumn("__jc", jc)
      .where(inter * tDen >= uni * tNum) // exact rational threshold
      .select(col("id1"), col("id2"),
        (inter.cast("double") / uni.cast("double")).as("jaccard"))
  }

  /** Blocked entity-resolution similarity join: record pairs whose NAME
    * character-trigram sets reach Jaccard ≥ tNum/tDen, restricted to the
    * same blocking key — the classic dirty-ER shape (block, then compare
    * within blocks; Christen, "Data Matching", 2012, ch. 4).
    *
    * Blocking is encoded IN the element strings (block ⊕ 0x01 ⊕ trigram):
    * cross-block pairs share zero elements, so the prefix filter kills
    * them before any join — no per-block nested loop exists, and a hot
    * block degrades into extra candidates for the positional filter
    * rather than a quadratic enumeration. Everything else (rare-first
    * global order, hashed join keys, integer threshold, exact verify) is
    * [[setSimJoin]]'s engine, unchanged. */
  def blockedErJoin(records: DataFrame, idCol: String, blockCol: String,
                    nameCol: String, tNum: Int = 4, tDen: Int = 5): DataFrame = {
    require(tNum > 0 && tDen >= tNum,
      s"blockedErJoin: threshold $tNum/$tDen must be in (0, 1]")
    val els = records.select(col(idCol).as("id"),
      explode(array_distinct(transform(
        sequence(lit(1), greatest(length(col(nameCol)) - 2, lit(1))),
        i => concat(col(blockCol).cast("string"), lit("\u0001"),
          col(nameCol).substr(i, lit(3)))))).as("tok"))
    setSimJoinOnElems(els, tNum, tDen)
  }

  /** Full MinHash-LSH near-dup pipeline: candidates → exact verify ≥ threshold.
    * The candidate set (tiny: near-dup pairs, not the corpus) is
    * materialized once via localCheckpoint — the verify stage references it
    * three times (ids union + both pair joins) and would otherwise re-run
    * the whole signature+bucket subtree per reference. */
  def minHashDedup(docs: DataFrame, threshold: Double = 0.8,
                   idCol: String = "doc_id", textCol: String = "text",
                   w: Int = 3, k: Int = 16, bands: Int = 4,
                   portable: Boolean = false,
                   maxBucketSize: Int = 10000): DataFrame = {
    val cand = minHashCandidates(docs, idCol, textCol, w, k, bands, portable, maxBucketSize)
      .localCheckpoint()
    jaccardVerify(docs, cand, idCol, textCol, w)
      .where(col("jaccard") >= threshold)
  }

  /** Resolve near-dup PAIRS into dedup CLUSTERS: every doc labeled with
    * its cluster's canonical representative — the min doc id in its
    * connected component of the pair graph ([[graft.operators.Graph
    * .connectedComponents]]); docs with no pair keep themselves. Pairs
    * alone under-dedup transitive chains (A~B, B~C: LSH may never emit
    * A~C, yet all three are one template family — keep exactly one). */
  def dedupClusters(docs: DataFrame, pairs: DataFrame,
                    idCol: String = "doc_id"): DataFrame = {
    val cc = graft.operators.Graph.connectedComponents(pairs, "id1", "id2")
      .withColumnRenamed("node", idCol)
    docs.select(col(idCol))
      .join(cc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("cluster_id"))
  }

  // ---- SimHash ----

  /** 64-bit SimHash over distinct lowercased token hashes: bit j of the
    * sketch is 1 iff the sum over tokens of ±1 (sign of token-hash bit j)
    * is positive. 64-bit per Manku et al. (WWW 2007) so pigeonhole bands
    * at maxHamming=3 carry 16-bit keys — a 32-bit sketch's 8-bit bands
    * (256 buckets) flood past any cap at 10⁹⁺ docs and recall collapses.
    * Case-normalized to agree with textDigest's notion of duplicate.
    * Codegen'd single pass ([[graft.functions.SimHashExpr]]). */
  def simHash(text: Column): Column = FastExprs.simHash(text)

  /** Column-algebra reference implementation of [[simHash]] — one closure
    * call per token × 64 bits, no whole-stage codegen. Kept only as the
    * bit-identity witness for the spec; never use on a hot path. */
  def simHashColumn(text: Column): Column = {
    val hashed = transform(array_distinct(tokens(lower(text))),
      t => graft.text.TextAnalysis.portableHash64(t))
    val counts = aggregate(hashed,
      transform(sequence(lit(0), lit(63)), _ => lit(0L)),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(63)),
        (a, j) => a + when(call_function("shiftrightunsigned", h, j).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L))))
    aggregate(zip_with(counts, sequence(lit(0), lit(63)),
      (c, j) => when(c > 0, call_function("shiftleft", lit(1L), j)).otherwise(lit(0L))),
      lit(0L), (acc, b) => acc.bitwiseOR(b))
  }

  /** SimHash dup groups: identical 64-bit sketch (hamming 0). For
    * hamming≤k use [[simHashNearDup]]. */
  def simHashGroups(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame =
    docs.select(col(idCol), simHash(col(textCol)).as("simhash"))
      .groupBy("simhash")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** SimHash near-dup pairs at Hamming distance ≤ `maxHamming`, banded:
    * split the 64-bit sketch into maxHamming+1 contiguous bit bands — by
    * pigeonhole any pair within distance k agrees exactly on at least one
    * band — bucket-join per (band, bandBits), then verify
    * bit_count(sk1 XOR sk2) ≤ k on the candidates. At the default
    * maxHamming=3 the band keys are 16 bits (Manku et al., WWW 2007
    * geometry): 65 536 buckets per band, so per-bucket population stays
    * cap-friendly at web-corpus cardinalities.
    *
    * Scale shape mirrors minHashCandidates: the sketch is computed
    * scan-side in one compiled pass, the only shuffles are the band-bucket
    * exchange (cardinality #docs × (k+1), never corpus width) and the
    * final pair distinct; oversized template buckets are capped the same
    * way. */
  def simHashNearDup(docs: DataFrame, maxHamming: Int = 3,
                     idCol: String = "doc_id", textCol: String = "text",
                     maxBucketSize: Int = 10000): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming must be in [0, 64), got $maxHamming")
    val bands = maxHamming + 1
    val cut = (0 to bands).map(b => b * 64 / bands) // band b = bits [cut(b), cut(b+1))
    def mask(width: Int): Long = if (width >= 64) -1L else (1L << width) - 1
    val sk = docs.select(col(idCol), simHash(col(textCol)).as("sk"))
    val banded = sk.select(col(idCol), col("sk"),
      posexplode(array((0 until bands).map { b =>
        val width = cut(b + 1) - cut(b)
        // arithmetic shift + mask ≡ logical shift: the mask kills the
        // sign-extension bits, so negative 64-bit sketches band correctly
        shiftright(col("sk"), cut(b)).bitwiseAND(lit(mask(width)))
      }: _*)))
      .select(col(idCol), col("sk"), col("pos").as("band"), col("col").as("key"))
    // Bucket-size guard AND pair generation in ONE aggregate (the same
    // shape as [[minHashCandidates]]): each (band, key) bucket collects
    // its id-sorted (id, sketch) structs — the size predicate IS the
    // guard, so the old okKeys broadcast-semi-join / count-window split
    // and the checkpoint both retire, and the pair self-join (two leg
    // exchanges + k²-to-C(k,2) filtering) becomes a positional explode.
    val buckets = banded.groupBy("band", "key")
      .agg(sort_array(collect_list(struct(col(idCol).as("id"), col("sk"))))
        .as("es"))
      .where(size(col("es")).between(2, maxBucketSize))
    buckets
      // two-step explode: never materializes a bucket's C(k,2) pair array
      .select(posexplode(col("es")).as(Seq("i", "e1")), col("es"))
      .select(col("e1"), explode(slice(col("es"), col("i") + lit(2),
        size(col("es")) - col("i") - 1)).as("e2"))
      .select(col("e1.id").as("id1"), col("e2.id").as("id2"),
        bit_count(col("e1.sk").bitwiseXOR(col("e2.sk"))).cast("int").as("hamming"))
      // verify BEFORE the pair-dedup shuffle: hamming is a pure function of
      // the two sketches, so filter-then-distinct ≡ distinct-then-filter,
      // but only surviving pairs pay the exchange (candidates that fail the
      // bound — the vast majority — die map-side)
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  // ---- segment-level exact dedup + decontamination ----

  /** Consecutive `segTokens`-token segments of `text` (last one partial),
    * each rejoined with single spaces — the fixed-window unit of
    * segment-level exact dedup (Lee et al., "Deduplicating Training Data
    * Makes Language Models Better", ACL 2022, uses 50-token windows).
    * Codegen'd single pass ([[graft.functions.SegmentsExpr]]). */
  def segments(text: Column, segTokens: Int): Column =
    FastExprs.segments(text, segTokens)

  /** Column-algebra reference of [[segments]] — the spec's element-
    * identity witness (interpreted regex + slice + join per window;
    * never use on a hot path). */
  def segmentsColumn(text: Column, segTokens: Int): Column = {
    val toks = tokens(text)
    transform(
      sequence(lit(0), ceil(size(toks).cast("double") / segTokens).cast("int") - 1),
      i => array_join(slice(toks, i * segTokens + 1, lit(segTokens)), " "))
  }

  /** Segment-level exact dedup: drop every repetition of a token window
    * that already occurred earlier in the corpus (earlier = smaller
    * (doc_id, segment_no)), and reassemble each document from its
    * surviving segments. Documents whose every segment is a repeat
    * disappear entirely.
    *
    * Scale shape: one explode (docs × segments/doc), one groupBy on the
    * segment's 64-bit digest to pick the global first occurrence (only
    * (digest, doc, seg_no) triples shuffle — never segment text), a
    * self-equi-join on the digest to keep winners, one final groupBy(doc)
    * to reassemble. */
  def segmentDedup(docs: DataFrame, segTokens: Int = 10,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // Decide with DIGESTS, move text never (guide-§8 shape): the decision
    // passes explode (id, seg_no, digest) longs only — the previous shape
    // carried segment TEXT through the digest exchange AND re-shuffled it
    // for the reassembly aggregate. Reassembly is now a row-local slice of
    // the re-derived segment array under a per-doc keep-list join (the
    // only time anything doc-sized moves, and only the int list).
    val segD = docs.select(col(idCol),
      posexplode(transform(segments(col(textCol), segTokens), s => xxhash64(s)))
        .as(Seq("seg_no", "digest")))
      .localCheckpoint() // (id, seg_no, digest) longs; one tokenize pass
    val winners = segD.groupBy("digest")
      .agg(min(struct(col(idCol), col("seg_no"))).as("w"))
      .select(col("w").getField(idCol).as(idCol),
        col("w").getField("seg_no").as("seg_no"))
    // per-doc keep-list, ascending = the old (seg_no, seg) sort order
    val keepSets = winners.groupBy(col(idCol))
      .agg(sort_array(collect_list(col("seg_no"))).as("__keep"))
    val segs = segments(col(textCol), segTokens)
    // zip_with evaluates the segment array ONCE per row; an element_at
    // inside a transform over __keep would re-derive the whole array per
    // kept element (quadratic in segments/doc)
    val kept = filter(zip_with(segs, sequence(lit(0), size(segs) - 1),
      (sg, i) => when(array_contains(col("__keep"), i), sg)), x => x.isNotNull)
    docs.join(keepSets, Seq(idCol))
      .select(col(idCol),
        array_join(kept, " ").as("kept_text"),
        size(col("__keep")).cast("int").as("n_kept"))
  }

  /** Boilerplate removal (C4/RefinedWeb-style): drop every token window
    * that occurs in at least `minDocs` DISTINCT documents — nav bars,
    * cookie banners, license footers — from ALL documents, and reassemble.
    * The complement of [[segmentDedup]]: that keeps the FIRST occurrence
    * of a repeated window; this removes boilerplate from every copy
    * including the first (a template shared by 10k pages is noise in all
    * 10k, not content in one). Documents reduced to nothing disappear.
    *
    * Output: (id, kept_text, n_kept, n_dropped).
    *
    * Scale shape: one explode, one groupBy on the 64-bit window digest
    * counting distinct docs (only (digest, id) longs shuffle — dedup
    * within a doc is map-side via the distinct agg), an anti-join of
    * segments against the boilerplate digests, one groupBy(doc) to
    * reassemble. Text crosses the wire once, in the reassembly. */
  def boilerplateRemove(docs: DataFrame, segTokens: Int = 10, minDocs: Int = 2,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(minDocs >= 2, s"boilerplateRemove: minDocs must be >= 2, got $minDocs")
    // same digests-decide / text-never-moves shape as [[segmentDedup]];
    // n_total comes row-locally off the re-derived segment array, which
    // also retires the old second join back onto `docs`
    val segD = docs.select(col(idCol),
      posexplode(transform(segments(col(textCol), segTokens), s => xxhash64(s)))
        .as(Seq("seg_no", "digest")))
      .localCheckpoint() // evaluated once: feeds the boiler agg AND the anti-join leg
    val boiler = segD.groupBy("digest")
      .agg(count_distinct(col(idCol)).as("n_docs"))
      .where(col("n_docs") >= minDocs)
      .select("digest")
    val keepSets = segD.join(boiler, Seq("digest"), "left_anti")
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("seg_no"))).as("__keep"))
    val segs = segments(col(textCol), segTokens)
    // same zip_with-once reassembly as [[segmentDedup]]
    val kept = filter(zip_with(segs, sequence(lit(0), size(segs) - 1),
      (sg, i) => when(array_contains(col("__keep"), i), sg)), x => x.isNotNull)
    docs.join(keepSets, Seq(idCol))
      .select(col(idCol),
        array_join(kept, " ").as("kept_text"),
        size(col("__keep")).cast("int").as("n_kept"),
        (size(segs) - size(col("__keep"))).as("n_dropped"))
  }

  /** MinHash band buckets of each document: (id, bucket) with one row per
    * band — the INDEX side of incremental near-dup. Persist this once for
    * the corpus; each new batch probes it without re-shingling the corpus. */
  def minHashBuckets(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text", w: Int = 3, k: Int = 16,
                     bands: Int = 4, portable: Boolean = false): DataFrame = {
    val rows = k / bands
    docs.select(col(idCol),
        FastExprs.minHashSignature(col(textCol), w, k, portable).as("sig"))
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"), slice(col("sig"), b * rows + 1, lit(rows)).as("slice")))))
      .select(col(idCol), xxhash64(col("col.band"), col("col.slice")).as("bucket"))
  }

  /** Incremental near-dup: candidate (batch doc, earlier doc) pairs for a
    * NEW BATCH against an existing corpus band index
    * ([[minHashBuckets]] output, typically read back from storage) plus
    * the batch itself — the nightly-ingest shape of MinHash dedup, where
    * re-banding a 100 TB corpus per batch would dwarf the batch cost.
    *
    * Matches are any indexed or batch doc with a SMALLER id than the batch
    * doc (smaller = earlier = already accepted), so each batch doc dedups
    * against history and batch-internal pairs surface exactly once.
    * Returns (id, match_id, jaccard) pairs verified to exact shingle
    * Jaccard ≥ `minJaccard` — `allDocs` supplies the text for both legs of
    * the verify (only candidate ids are re-shingled, via the semi-join
    * inside [[jaccardVerify]]).
    *
    * Scale shape: the batch is banded scan-side (small); the join against
    * the index shuffles (bucket, id) longs; the same bucket-size guard as
    * [[minHashCandidates]] caps template-collision fan-out. */
  def incrementalNearDup(index: DataFrame, batch: DataFrame, allDocs: DataFrame,
                         minJaccard: Double, idCol: String = "doc_id",
                         textCol: String = "text", w: Int = 3, k: Int = 16,
                         bands: Int = 4, portable: Boolean = false,
                         maxBucketSize: Int = 10000): DataFrame = {
    val probe = minHashBuckets(batch, idCol, textCol, w, k, bands, portable)
    val pool = index.select(col(idCol), col("bucket"))
      .unionByName(probe)
    // bucket-size guard + pool-side collection in ONE aggregate (the
    // minHashCandidates shape): the old pool-wide count WINDOW
    // (exchange + sort of every pool row) and the pool-side join leg
    // both retire — the probe joins one array row per surviving bucket
    // and earlier ids explode row-locally
    val buckets = pool.groupBy("bucket")
      .agg(collect_list(col(idCol)).as("ids"))
      .where(size(col("ids")) <= maxBucketSize)
    val cand = probe.withColumnRenamed(idCol, "id2")
      .join(buckets, Seq("bucket"))
      .select(col("id2"),
        explode(filter(col("ids"), x => x < col("id2"))).as("id1"))
      .select("id1", "id2").distinct()
    jaccardVerify(allDocs, cand, idCol, textCol, w)
      .where(col("jaccard") >= minJaccard)
      .select(col("id2").as(idCol), col("id1").as("match_id"), col("jaccard"))
  }

  /** Streaming twin of [[incrementalNearDup]]: continuous-ingest near-dup
    * maintenance. Each micro-batch probes the durable band index under
    * `stateDir`, appends its verified matches, then commits its own bands
    * and texts — the corpus is banded exactly once, ever, no matter how
    * many batches arrive (the property that makes nightly dedup of a
    * 100 TB corpus affordable).
    *
    * State layout (all parquet, one `batch=<id>` subdir per micro-batch,
    * each written with overwrite so a crash-redelivered batch is
    * IDEMPOTENT rather than duplicated):
    *   stateDir/index — (id, bucket) band index of everything ingested
    *   stateDir/docs  — (id, text) for candidate verification
    *   stateDir/pairs — (id, match_id, jaccard) verified matches
    *
    * Requires ingest ids to be monotone across batches (earlier batch =
    * smaller ids), the same "earlier = already accepted" contract as
    * [[incrementalNearDup]]. Pairs are written before index/docs, so a
    * crash between the writes re-runs the batch and overwrites — never
    * drops — its output. */
  def nearDupStream(spark: SparkSession, docs: DataFrame, stateDir: String,
                    checkpoint: String, minJaccard: Double,
                    idCol: String = "doc_id", textCol: String = "text",
                    w: Int = 3, k: Int = 16, bands: Int = 4,
                    portable: Boolean = false, maxBucketSize: Int = 10000,
                    availableNow: Boolean = false): StreamingQuery = {
    val idxPath = s"$stateDir/index"
    val docsPath = s"$stateDir/docs"
    val pairsPath = s"$stateDir/pairs"
    def exists(p: String): Boolean =
      graft.operators.Upsert.tableExists(spark, p)
    val writer = docs.writeStream
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        if (!batch.isEmpty) {
          val b = batch.select(col(idCol), col(textCol)).localCheckpoint()
          // A crash between this batch's index/docs writes and the
          // checkpoint commit replays the batch with its OWN state already
          // durable: its bands would sit in the bucket pool twice
          // (index + probe), double-counting toward maxBucketSize — a
          // finite cap could then drop candidate pairs the uncrashed run
          // keeps, and the replay would overwrite pairs/batch=<bid> with
          // the smaller result. Anti-joining the batch ids out of BOTH
          // state reads makes the replay see exactly the pre-batch state,
          // so redelivery is idempotent for any crash point.
          val bIds = b.select(col(idCol))
          val index =
            if (exists(idxPath))
              spark.read.parquet(idxPath).select(col(idCol), col("bucket"))
                .join(bIds, Seq(idCol), "left_anti")
            else b.select(col(idCol)).limit(0).withColumn("bucket", lit(0L))
          val known =
            if (exists(docsPath))
              spark.read.parquet(docsPath).select(col(idCol), col(textCol))
                .join(bIds, Seq(idCol), "left_anti")
            else b.limit(0)
          val all = known.unionByName(b)
          val pairs = incrementalNearDup(index, b, all, minJaccard,
            idCol, textCol, w, k, bands, portable, maxBucketSize)
          // staged-rename sink: each batch dir is either absent or
          // complete — a racing reader never sees a half-written rewrite
          graft.sources.FsUtils.writeDirAtomic(spark, pairs,
            s"$pairsPath/batch=$bid")
          graft.sources.FsUtils.writeDirAtomic(spark,
            minHashBuckets(b, idCol, textCol, w, k, bands, portable),
            s"$idxPath/batch=$bid")
          graft.sources.FsUtils.writeDirAtomic(spark, b, s"$docsPath/batch=$bid")
          graft.operators.Graph.unpersist(b)
        }
      }
      .option("checkpointLocation", checkpoint)
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** Decontamination probe: documents sharing at least one w-shingle with
    * the `probe` set (e.g. an eval benchmark) — the standard n-gram
    * contamination check run before training. Output: (id, n_hits).
    *
    * Scale shape: the probe's distinct shingles are exploded and
    * broadcast; the corpus explodes scan-side and semi-aggregates per
    * (id, shingle) — corpus text never shuffles, only matched shingle
    * hits do. */
  def contamination(docs: DataFrame, probe: DataFrame, w: Int = 3,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val probeShingles = probe
      .select(explode(shingles(col(textCol), w)).as("sh")).distinct()
    docs.select(col(idCol), explode(shingles(col(textCol), w)).as("sh"))
      .join(broadcast(probeShingles), Seq("sh"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_hits"))
  }

  // ---- embedding near-dup ----

  /** Quantize a float vector to exact integers (×1000, floor). Float
    * addition is not associative — quantizing first makes every downstream
    * aggregate exact, deterministic, and engine-portable. Codegen'd
    * ([[graft.functions.QuantizeExpr]]). */
  def quantize(vec: Column): Column = FastExprs.quantize(vec)

  def dotL(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Cosine over quantized vectors — codegen'd single pass
    * ([[graft.functions.CosineQExpr]]); long dot products then double
    * division, so the score is bit-stable across engines and partitionings. */
  def cosineQ(a: Column, b: Column): Column = FastExprs.cosineQ(a, b)

  /** Embedding-cosine near-dup pairs above `threshold` among ids < `cap`
    * (exact pairwise is O(n²): cap it, or use [[cosineNearDupLsh]]). */
  def embeddingNearDup(embeddings: DataFrame, threshold: Double = 0.95,
                       cap: Long = 1000, idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val q = embeddings.where(col(idCol) < cap)
      .select(col(idCol), quantize(col(vecCol)).as("q"))
    val l = q.select(col(idCol).as("id1"), col("q").as("q1"))
    val r = q.select(col(idCol).as("id2"), col("q").as("q2"))
    l.join(r, col("id1") < col("id2"))
      .select(col("id1"), col("id2"), cosineQ(col("q1"), col("q2")).as("cos_sim"))
      .where(col("cos_sim") >= threshold)
  }

  /** Embedding-cosine near-dup, sign-LSH-bucketed — the 100 TB path for
    * [[embeddingNearDup]]: candidate pairs are those whose sign-LSH buckets
    * differ in at most one plane (the standard multi-probe recall boost),
    * verified with exact quantized cosine ≥ `threshold`.
    *
    * Scale shape: the corpus is bucketed exactly once, scan-side, with the
    * compiled constant-plane kernel; the probe fan-out (planes+1 keys per
    * row) happens on join KEYS, never on vector payloads twice — one leg
    * carries the true bucket only, the other the probe set, so every
    * qualifying pair materializes exactly once and the join moves each
    * vector planes+2 times total. Oversized template buckets are capped on
    * both legs like minHashCandidates. Approximate by design:
    * recall at cosine θ is P[≤1 of `planes` hyperplanes split the pair] —
    * raise `planes` to shrink buckets on bigger corpora (candidate work per
    * row scales with planes·n/2^planes). */
  def cosineNearDupLsh(embeddings: DataFrame, threshold: Double = 0.5,
                       planes: Int = 8, idCol: String = "vec_id",
                       vecCol: String = "embedding", dims: Int = -1,
                       maxBucketSize: Int = 10000): DataFrame = {
    val d =
      if (dims > 0) dims
      else embeddings.select(size(col(vecCol))).head(1).headOption.map(_.getInt(0))
        .getOrElse(throw new IllegalArgumentException(
          "cosineNearDupLsh: empty corpus — pass dims explicitly"))
    val m = graft.similarity.Similarity.planeMatrix(planes, d)
    // cap template buckets on BOTH legs (rows of an oversized bucket leave
    // the candidate set entirely) — a one-leg guard would make survival of
    // a cross-bucket pair depend on which doc has the smaller id. Small
    // keyspaces get a tiny broadcast-semi-joined aggregate (no corpus-wide
    // window shuffle per leg); many-plane configs (2^planes buckets could
    // approach corpus size — too big to collect) fall back to the window.
    val raw = embeddings.select(col(idCol).as("id"),
        quantize(col(vecCol)).as("v"))
      .withColumn("bucket", graft.functions.FastExprs.signLshBucket(col("v"), m))
    val base =
      if (planes <= 20) {
        val okBuckets = raw.groupBy("bucket").agg(count(lit(1)).as("__n"))
          .where(col("__n") <= maxBucketSize).select("bucket")
        raw.join(broadcast(okBuckets), Seq("bucket"), "left_semi")
      } else {
        val w = org.apache.spark.sql.expressions.Window.partitionBy("bucket")
        raw.withColumn("__n", count(lit(1)).over(w))
          .where(col("__n") <= maxBucketSize).drop("__n")
      }
    val l = base.select(col("id").as("id1"), col("v").as("v1"), col("bucket").as("key"))
    val r = base.withColumn("key", explode(array(
        col("bucket") +: (0 until planes).map(p =>
          col("bucket").bitwiseXOR(lit(1L << p))): _*)))
      .select(col("id").as("id2"), col("v").as("v2"), col("key"))
    l.join(r, Seq("key")).where(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), cosineQ(col("v1"), col("v2")).as("cos_sim"))
      .where(col("cos_sim") >= threshold)
  }

  /** SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication", arXiv:2303.09540):
    * cluster-scoped semantic dedup. The corpus is partitioned into cells
    * by nearest coarse centroid — the same scan-side literal-centroid
    * ranking as IVF search ([[graft.similarity.Similarity.cellRanking]]),
    * so assignment costs zero shuffles — then, per cell, a row is dropped
    * when any LOWER-id row of the same cell has quantized cosine ≥
    * `threshold` (the paper's upper-triangular keep-first policy; theirs
    * orders by distance-to-centroid, ours by id for cross-engine
    * determinism).
    *
    * Scale shape: pair generation never crosses cells, so the only
    * shuffle is the self-join on cell id and the quadratic blow-up is
    * Σ|cell|² — bounded by the quantizer, not the corpus. At 100 TB raise
    * `nlist` (or pass k-means-trained `centroids` from
    * [[graft.similarity.Similarity.trainCentroids]]) so cells stay ~1e4
    * rows; the paper runs the identical shape at 5e7 points per
    * clustering.
    *
    * MEASURED CONTRACT (round-10 sf1→sf10 audit, PLANS.md): the total
    * cost is n·nlist (scan-side assignment) + Σ|cell|² (in-cell pairs);
    * the optimal nlist ∝ √n makes the whole operator Θ(n^1.5) — ~31.6×
    * per 10× data is the FLOOR of cell-scoped pairwise dedup, not a
    * regression (fixed nlist measured 30.8×/decade, corpus-scaled nlist
    * 22.6×/decade). When a linear decade ratio is required, use the
    * banded-LSH near-dup path ([[cosineNearDupLsh]], measured
    * 8.0×/decade) and reserve SemDeDup for the bounded cells the paper
    * applies it to. Returns every input row: (vec_id, cell, kept). */
  def semanticDedup(embeddings: DataFrame, threshold: Double = 0.3,
                    nlist: Int = 16, idCol: String = "vec_id",
                    vecCol: String = "embedding",
                    centroids: Seq[Seq[Long]] = Nil): DataFrame = {
    import graft.similarity.Similarity
    val cents: Array[(Int, Seq[Long])] =
      if (centroids.nonEmpty) centroids.toArray.zipWithIndex.map(_.swap)
      else Similarity.seededCentroids(embeddings, nlist, idCol, vecCol)
    val assigned = embeddings
      .select(col(idCol).as("vec_id"), quantize(col(vecCol)).as("v"))
      .withColumn("cell",
        element_at(Similarity.cellRanking(cents, col("v")), 1).getField("cell"))
    val l = assigned.select(col("vec_id").as("id1"), col("cell"), col("v").as("v1"))
    val r = assigned.select(col("vec_id").as("id2"), col("cell"), col("v").as("v2"))
    val dropped = l.join(r, Seq("cell"))
      .where(col("id1") < col("id2") &&
        cosineQ(col("v1"), col("v2")) >= threshold)
      .select(col("id2").as("vec_id")).distinct()
    assigned.join(dropped.withColumn("__dup", lit(1)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("__dup").isNull.as("kept"))
  }
}
