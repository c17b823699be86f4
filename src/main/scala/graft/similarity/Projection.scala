package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftglue.Glue

/** Embedding-vector transforms for the curation/ANN pipeline: random-sign
  * projection (Johnson–Lindenstrauss / Achlioptas), product-quantization
  * encoding (Jégou et al., "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011), and per-dimension min-max scaling.
  *
  * All three are SCAN-SIDE column transforms over quantized integer
  * vectors (see Dedup.quantize): no shuffle, no state, one pass, and —
  * because every multiply/add is 64-bit integer arithmetic — bit-identical
  * on any engine and any partitioning (float dot products are not
  * associative; integer ones are). The projection matrix and PQ codebooks
  * are DETERMINISTIC ARITHMETIC (an LCG over the cell index), not stored
  * parameters: a 1000-executor scan rebuilds them from three literals
  * instead of broadcasting a matrix, and any SQL engine can replay them.
  *
  * Scale shape of the JL path: 100 TB of 1024-dim float vectors become
  * ~1.5 TB of 16-dim long vectors in one mapper pass — the cheap prefilter
  * for the exact-cosine rerank (Achlioptas, JCSS 2003 shows ±1 entries
  * preserve pairwise distances with the same JL guarantee as Gaussians).
  */
object Projection {

  /** glibc-style LCG constants; every derived value stays well inside a
    * signed 64-bit range, so `%` agrees across engines (operands never go
    * negative). Single source of truth for the Scala side AND the DuckDB
    * oracle SQL (Queries mirrors these literals). */
  val SignA = 1103515245L
  val SignC = 12345L
  val SignM = 2147483648L // 2^31

  /** ±1 sign for flat matrix cell `idx` (= row*inDim + col). */
  private def signAt(idx: Column): Column =
    when(((lit(SignA) * idx + lit(SignC)) % lit(SignM)) % 2 === 0, lit(1L))
      .otherwise(lit(-1L))

  /** Johnson–Lindenstrauss sign projection of a quantized (long) vector to
    * `outDim` dimensions: out[p] = Σ_j q[j] · sign(p·inDim + j).
    * Codegen'd single pass ([[graft.functions.JlProjectExpr]]). */
  def jlProject(qvec: Column, inDim: Int, outDim: Int): Column =
    Glue.column(graft.functions.JlProjectExpr(Glue.expression(qvec), inDim, outDim))

  /** Column-algebra reference implementation of [[jlProject]] — kept as
    * the bit-identity witness for the spec; interpreted lambda sweeps per
    * output dim, never use on a hot path. */
  def jlProjectColumn(qvec: Column, inDim: Int, outDim: Int): Column = {
    require(outDim >= 1 && inDim >= 1, s"jlProject: bad dims $inDim -> $outDim")
    transform(sequence(lit(0), lit(outDim - 1)), p =>
      aggregate(
        zip_with(qvec, sequence(lit(0L), lit(inDim - 1L)),
          (x, j) => x * signAt(p.cast("long") * inDim + j)),
        lit(0L), (acc, x) => acc + x))
  }

  /** PQ codebook entry for (subspace s, centroid k, local dim d) with
    * `subDim` dims per subspace and `nCent` centroids: an LCG value folded
    * into [-200, 200] — the typical component range of a quantized
    * unit-norm vector. Deterministic arithmetic, replayable in SQL. */
  val CentA = 69069L
  val CentC = 362437L
  val CentRange = 401L // values in [-200, 200]

  private def centroidAt(flatIdx: Column): Column =
    ((lit(CentA) * flatIdx + lit(CentC)) % lit(SignM)) % lit(CentRange) - lit((CentRange - 1) / 2)

  /** Product-quantization encoding: split the quantized vector into
    * `nSub` contiguous subspaces and, per subspace, pick the centroid with
    * the smallest squared L2 distance (ties → smallest centroid id, via
    * struct-min ordering). Returns array<struct(code int, dist long)> of
    * length `nSub` — the code byte plus its quantization error, so the
    * caller gets the reconstruction error (Σ dist) for free.
    *
    * Scale: the encode is one scan-side pass (no shuffle, no broadcast —
    * codebooks are arithmetic); at 100 TB this is the map stage that turns
    * each 4 KB float vector into `nSub` bytes for an in-memory ADC index.
    * Codegen'd single pass ([[graft.functions.PqEncodeExpr]] — the nested
    * Column-lambda formulation measured ~1 ms/row at 64 dims). */
  def pqEncode(qvec: Column, inDim: Int, nSub: Int, nCent: Int): Column =
    Glue.column(graft.functions.PqEncodeExpr(Glue.expression(qvec), inDim, nSub, nCent))

  /** Column-algebra reference implementation of [[pqEncode]] — the
    * bit-identity witness for the spec; never use on a hot path. */
  def pqEncodeColumn(qvec: Column, inDim: Int, nSub: Int, nCent: Int): Column = {
    require(inDim % nSub == 0, s"pqEncode: $inDim not divisible by $nSub")
    val subDim = inDim / nSub
    transform(sequence(lit(0), lit(nSub - 1)), s =>
      array_min(transform(sequence(lit(0), lit(nCent - 1)), k => {
        val dist = aggregate(
          sequence(lit(0L), lit(subDim - 1L)),
          lit(0L),
          (acc, d) => {
            val flat = (s.cast("long") * nCent + k) * subDim + d
            val diff = element_at(qvec, (s * subDim + d + 1).cast("int")) - centroidAt(flat)
            acc + diff * diff
          })
        struct(dist.as("dist"), k.as("code"))
      })))
  }

  /** Deterministic demo query vector for the ADC path (and its oracle):
    * q[d] = LCG(d) folded into [-400, 400] — the component range of a
    * quantized unit-norm vector. Mirrored literally in the q117 SQL. */
  val QryA = 7919L
  val QryC = 104729L
  val QryRange = 801L

  def demoQuery(dim: Int): Seq[Long] =
    (0 until dim).map { d =>
      ((QryA * d + QryC) % SignM) % QryRange - (QryRange - 1) / 2
    }

  /** Asymmetric-distance (ADC) top-k over PQ codes (Jégou et al. TPAMI
    * 2011 §III): the query is quantized ONCE into an nSub × nCent lookup
    * table of squared L2 distances to every centroid, and each stored
    * vector's approximate distance is the sum of `nSub` table lookups over
    * its code bytes — no stored vector is ever decoded.
    *
    * `lut(s)(k)` must be the query-to-centroid table (computed driver-side
    * from the same arithmetic codebooks — tiny: nSub·nCent longs, shipped
    * as a literal into the plan). Scale shape: ONE scan over the codes
    * column + a TakeOrderedAndProject — at 100 TB the codes table is
    * ~nSub bytes/vector and the scan is the entire cost; compose with the
    * IVF cell filter (Similarity.ivfTopK) to touch only probed cells. */
  def adcDistance(codes: Column, lut: Seq[Seq[Long]]): Column = {
    val lutCol = typedLit(lut.map(_.toIndexedSeq).toIndexedSeq)
    aggregate(
      zip_with(codes, sequence(lit(0), lit(lut.size - 1)),
        (c, s) => element_at(element_at(lutCol, s + 1), c + 1)),
      lit(0L), (acc, x) => acc + x)
  }

  /** The query-side ADC lookup table: squared L2 distance from each
    * `subDim`-slice of the quantized query to every arithmetic codebook
    * centroid. Driver-side (nSub · nCent · subDim multiplications, once
    * per query — never per row). */
  def adcLut(query: Seq[Long], nSub: Int, nCent: Int): Seq[Seq[Long]] = {
    require(query.size % nSub == 0, s"adcLut: ${query.size} not divisible by $nSub")
    val subDim = query.size / nSub
    val half = (CentRange - 1) / 2
    (0 until nSub).map { s =>
      (0 until nCent).map { k =>
        var dist = 0L
        var d = 0
        while (d < subDim) {
          val flat = (s.toLong * nCent + k) * subDim + d
          val c = ((CentA * flat + CentC) % SignM) % CentRange - half
          val diff = query(s * subDim + d) - c
          dist += diff * diff
          d += 1
        }
        dist
      }
    }
  }

  /** Min-max scale a quantized vector to [0, `scale`] per dimension given
    * per-dimension min/max arrays (from VectorAgg.vectorMin/vectorMax —
    * one aggregate over the corpus, d longs of state). Integer floor
    * division — operands are non-negative after the min shift, so Spark
    * `div` (truncation) and DuckDB `//` (floor) agree. Constant dimensions
    * (max == min) map to 0. */
  def minMaxScale(qvec: Column, minVec: Column, maxVec: Column, scale: Int = 10000): Column =
    zip_with(qvec, zip_with(minVec, maxVec, (lo, hi) => struct(lo.as("lo"), hi.as("hi"))),
      (x, b) => {
        val num = (x - b.getField("lo")) * scale
        val den = b.getField("hi") - b.getField("lo")
        // exact integer floor division: subtract pmod first so the double
        // division is over an exactly divisible numerator (same idiom as
        // Queries.floorDiv; `Column` has no `div`, and expr() can't see
        // lambda-local variables)
        when(den > 0, ((num - pmod(num, den)) / den).cast("long"))
          .otherwise(lit(0L))
      })
}
