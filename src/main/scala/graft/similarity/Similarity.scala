package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup.{quantize, cosineQ}
import graft.text.TextAnalysis.portableHash

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * ANN variants follow the published designs: random-hyperplane sign-LSH
  * (Charikar, STOC 2002) and inverted-file coarse quantization (IVF, as in
  * Jégou et al., "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011 — here with the identity fine quantizer).
  *
  * Baseline: brute-force cosine top-k (exact; O(queries × corpus) — fine
  * when the query side is small and broadcast). Scale path: sign-LSH
  * bucketing — corpus is pre-partitioned into 2^planes buckets scan-side;
  * each query probes only its own bucket, so the join key is the bucket id
  * and the shuffle moves corpus rows once, not queries × corpus.
  *
  * All scoring runs on quantized integer vectors (see Dedup.quantize):
  * float sums aren't associative across partitionings, int sums are — the
  * ranking is bit-stable no matter how Spark splits the data.
  */
object Similarity {

  /** Exact brute-force cosine top-k. `queries` is expected small —
    * broadcast it so the corpus never shuffles. Ties break on corpus id. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), quantize(col(vecCol)).as("cq"))
    val q = queries.select(col(idCol).as("query_id"), quantize(col(vecCol)).as("qq"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"), cosineQ(col("cq"), col("qq")).as("cos_sim"))
    topK(scored, k)
  }

  /** Hard-negative mining for contrastive training: per query, the top-k
    * most-similar corpus vectors carrying a DIFFERENT label (the pairs a
    * bi-encoder most needs to push apart). Same broadcast shape as
    * [[bruteForceTopK]] — the corpus never shuffles; the label predicate
    * rides the broadcast join, so excluded same-label rows are dropped
    * before any scoring work. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int = 10,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    labelCol: String = "label"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"),
      col(labelCol).as("c_label"), quantize(col(vecCol)).as("cq"))
    val q = queries.select(col(idCol).as("query_id"),
      col(labelCol).as("q_label"), quantize(col(vecCol)).as("qq"))
    val scored = c.join(broadcast(q), col("c_label") =!= col("q_label"))
      .select(col("query_id"), col("corpus_id"), col("c_label"),
        cosineQ(col("cq"), col("qq")).as("cos_sim"))
    topK(scored, k)
  }

  /** Shared ranking tail: per-query rank by cosine desc, ties on corpus id
    * — one definition so exact and ANN paths can never drift. */
  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * uniform in [-1000, 1000], derived from the portable hash so the
    * planes are identical across engines and runs. */
  private def planeComponent(p: Int, d: Column): Column =
    pmod(portableHash(concat_ws("_", lit("plane"), lit(p), d)), lit(2001L)) - lit(1000L)

  /** Sign-LSH bucket id: bit p = sign of <vec, plane_p>. 2^planes buckets.
    * Column-algebra reference implementation — recomputes the md5-derived
    * plane components per row; use [[planeMatrix]] +
    * FastExprs.signLshBucket on hot paths (bit-identical, tested). */
  def signLshBucket(qvec: Column, planes: Int = 8): Column = {
    val dims = sequence(lit(0), size(qvec) - 1)
    val bits = (0 until planes).map { p =>
      val dot = aggregate(zip_with(qvec, dims, (x, d) => x * planeComponent(p, d)),
        lit(0L), (acc, v) => acc + v)
      when(dot > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** The constant hyperplane matrix behind signLshBucket, evaluated once
    * driver-side (planeComponent(p,d) = pmod(portableHash("plane_p_d"),
    * 2001) − 1000). */
  def planeMatrix(planes: Int, dims: Int): Seq[Seq[Long]] =
    (0 until planes).map(p => (0 until dims).map(d =>
      graft.functions.FastExprs.portableHashJvm(s"plane_${p}_${d}") % 2001L - 1000L))

  /** IVF (inverted-file) ANN: corpus is partitioned into `nlist` cells by
    * nearest coarse centroid; each query scores only the corpus rows in its
    * `nprobe` nearest cells.
    *
    * Centroids are chosen deterministically (the first `nlist` corpus
    * vectors — a seeded coarse quantizer; swap in k-means-trained centroids
    * without touching the plan shape) and embedded as literals, so cell
    * assignment is a scan-side projection: no shuffle, no join, 16 compiled
    * cosine evals per row. The only shuffle is the final cell-id equi-join,
    * whose build side is the (small) probed-query table — at 100 TB the
    * corpus streams through once, partitioned by cell.
    */
  /** Deterministic spherical k-means for IVF coarse centroids: Lloyd's
    * iterations over a bounded, id-ordered sample, run driver-side on
    * unit-normalized vectors (cosine-compatible), init = first `nlist`
    * sample vectors. No randomness — same corpus → same centroids. */
  def trainCentroids(corpus: DataFrame, nlist: Int, iters: Int = 5,
                     maxSample: Int = 10000,
                     idCol: String = "vec_id", vecCol: String = "embedding"): Seq[Seq[Long]] = {
    val sample: Array[Array[Double]] = corpus.orderBy(col(idCol)).limit(maxSample)
      .select(quantize(col(vecCol)).as("q")).collect()
      .map(_.getSeq[Long](0).map(_.toDouble).toArray)
    require(sample.length >= nlist, s"need >= $nlist sample vectors, got ${sample.length}")
    val pts = sample.map { v =>
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    val dim = pts.head.length
    var cents = pts.take(nlist).map(_.clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(nlist)(new Array[Double](dim))
      val cnts = new Array[Int](nlist)
      pts.foreach { p =>
        var best = 0; var bestD = Double.MaxValue
        var cI = 0
        while (cI < nlist) {
          var d = 0.0; var i = 0
          while (i < dim) { val df = p(i) - cents(cI)(i); d += df * df; i += 1 }
          if (d < bestD) { bestD = d; best = cI }
          cI += 1
        }
        cnts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += p(i); i += 1 }
      }
      cents = Array.tabulate(nlist)(cI =>
        if (cnts(cI) == 0) cents(cI) else sums(cI).map(_ / cnts(cI)))
    }
    cents.map(c => c.map(x => math.floor(x * 1000.0).toLong).toSeq).toSeq
  }

  /** Seeded coarse quantizer: the first `nlist` corpus vectors by id,
    * quantized — the deterministic centroid set behind [[ivfTopK]] and
    * [[graft.dedup.Dedup.semanticDedup]] when no trained centroids are
    * passed. Bounded driver collect (`nlist` rows). */
  def seededCentroids(corpus: DataFrame, nlist: Int,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): Array[(Int, Seq[Long])] =
    corpus.orderBy(col(idCol)).limit(nlist)
      .select(quantize(col(vecCol)).as("q")).collect()
      .zipWithIndex.map { case (r, i) => (i, r.getSeq[Long](0)) }

  /** (similarity, cell) structs for quantized vector `q` against literal
    * `cents`, best first (ties → higher cell) — the scan-side cell ranking
    * shared by every coarse-quantized path, so IVF search and semantic
    * dedup can never disagree on an assignment. */
  def cellRanking(cents: Array[(Int, Seq[Long])], q: Column): Column = {
    val scored = array(cents.toIndexedSeq.map { case (cid, v) =>
      struct(cosineQ(q, typedLit(v)).as("sim"), lit(cid).as("cell"))
    }: _*)
    reverse(array_sort(scored))
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
              nlist: Int = 16, nprobe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding",
              centroids: Seq[Seq[Long]] = Nil): DataFrame = {
    val cents: Array[(Int, Seq[Long])] =
      if (centroids.nonEmpty) centroids.toArray.zipWithIndex.map(_.swap)
      else seededCentroids(corpus, nlist, idCol, vecCol)

    def cellRanks(q: Column): Column = cellRanking(cents, q)

    val c = corpus.select(col(idCol).as("corpus_id"), quantize(col(vecCol)).as("cq"))
      .withColumn("cell", element_at(cellRanks(col("cq")), 1).getField("cell"))
    val q = queries.select(col(idCol).as("query_id"), quantize(col(vecCol)).as("qq"))
      .withColumn("cell", explode(transform(
        slice(cellRanks(col("qq")), 1, nprobe), s => s.getField("cell"))))
    val scored = c.join(broadcast(q), Seq("cell"))
      .where(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"), cosineQ(col("cq"), col("qq")).as("cos_sim"))
    topK(scored, k)
  }

  /** Approximate top-k: probe the query's sign-LSH bucket, and with
    * `multiProbe=true` also every bucket at Hamming distance 1 (one plane's
    * sign flipped) — the standard recall boost that probes planes+1 buckets
    * per query instead of re-hashing the corpus with more tables. The
    * corpus is still bucketed exactly once; only the (small) query side
    * fans out. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10, planes: Int = 8,
              idCol: String = "vec_id", vecCol: String = "embedding",
              multiProbe: Boolean = false, dims: Int = -1): DataFrame = {
    // Callers that know the dimensionality pass `dims` and skip the probe
    // job; the fallback reads one row (and assumes — like the scoring
    // kernel, which throws on ragged vectors — that all dims are uniform).
    val d =
      if (dims > 0) dims
      else corpus.select(size(col(vecCol))).head(1).headOption.map(_.getInt(0))
        .getOrElse(throw new IllegalArgumentException(
          "lshTopK: empty corpus — pass dims explicitly"))
    val m = planeMatrix(planes, d)
    val fastBucket = graft.functions.FastExprs.signLshBucket(_: Column, m)
    val c = corpus.select(col(idCol).as("corpus_id"), quantize(col(vecCol)).as("cq"))
      .withColumn("bucket", fastBucket(col("cq")))
    val baseQ = queries.select(col(idCol).as("query_id"), quantize(col(vecCol)).as("qq"))
      .withColumn("bucket", fastBucket(col("qq")))
    val q =
      if (!multiProbe) baseQ
      else baseQ.withColumn("bucket", explode(array(
          col("bucket") +: (0 until planes).map(p =>
            col("bucket").bitwiseXOR(lit(1L << p))): _*)))
        .dropDuplicates("query_id", "bucket")
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"), cosineQ(col("cq"), col("qq")).as("cos_sim"))
    topK(scored, k)
  }

  /** Per-group mean embedding (centroid) — the distributed aggregation
    * behind k-means/IVF training and per-class prototype vectors. Returns
    * one row per group: element-wise quantized sum `sum_q`
    * (array<long>, via [[graft.functions.VectorSumLong]]) and member
    * count `n`; centroid dimension d = `sum_q[d] / (1000·n)`.
    *
    * Scale shape: the naive posexplode → groupBy(group, dim) shuffles
    * n·d rows; this aggregate's partial state is one d-long array per
    * group per partition — d·partitions longs cross the wire, the same
    * plan as a groupBy count. Integer sums keep the result bit-identical
    * on any partitioning (float sums are order-sensitive). */
  def groupCentroids(emb: DataFrame, groupCol: String, vecCol: String,
                     dim: Int): DataFrame =
    emb.where(col(vecCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(graft.functions.VectorAgg.vectorSum(quantize(col(vecCol)), dim)
          .as("sum_q"),
        count(lit(1)).as("n"))
}
