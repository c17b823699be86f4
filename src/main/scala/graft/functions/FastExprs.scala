package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.{Glue => ExpressionUtils}
import org.apache.spark.sql.graftglue.GlueTypes.AbstractDataType
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot per-row kernels.
  *
  * The pure-Column formulations of MinHash / cosine (see Dedup) are built
  * from higher-order functions, which Catalyst evaluates with one closure
  * invocation per array element and no whole-stage codegen — measured at
  * ~110 s for 5k docs × 16 hashes at sf0.1. These expressions compute the
  * same values (bit-identical: same xxhash64 seed-42 base hash, same affine
  * family, same long/double arithmetic) in a single compiled pass via a
  * static call, the same codegen pattern Spark's own hash expressions use.
  * They stay inside WholeStageCodegen, so the surrounding scan → project →
  * shuffle pipeline is unbroken.
  */
object FastExprs {

  /** MinHash signature of whitespace-tokenized `w`-shingles of `text`;
    * bit-identical to Dedup.minHashSignature(Dedup.shingles(text, w), k,
    * portable). `portable=true` bases on the md5-digit hash (reproducible
    * in any engine, incl. the DuckDB oracle); false on xxhash64 seed 42. */
  def minHashSignature(text: Column, w: Int, k: Int, portable: Boolean = false): Column =
    ExpressionUtils.column(MinHashSignatureExpr(ExpressionUtils.expression(text), w, k, portable))

  /** Cosine similarity of two quantized (long) vectors; bit-identical to
    * Dedup.cosineQ (long dot products, then double division). */
  def cosineQ(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineQExpr(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Quantize a float/double vector: floor(x*1000) as long per element;
    * bit-identical to Dedup.quantize. */
  def quantize(vec: Column): Column =
    ExpressionUtils.column(QuantizeExpr(ExpressionUtils.expression(vec)))

  /** Sign-LSH bucket of a quantized vector against a constant hyperplane
    * matrix; bit-identical to Similarity.signLshBucket's Column algebra but
    * the planes are evaluated once driver-side, not md5'd per row. */
  def signLshBucket(vec: Column, planes: Seq[Seq[Long]]): Column =
    ExpressionUtils.column(SignLshBucketExpr(ExpressionUtils.expression(vec), planes))

  /** Distinct w-shingles of `text`, first-occurrence order; element-
    * identical to the Column-algebra path ([[ShinglesExpr.compute]]). */
  def shingles(text: Column, w: Int): Column =
    ExpressionUtils.column(ShinglesExpr(ExpressionUtils.expression(text), w))

  /** Rolling-polynomial document fingerprint; value-identical to the
    * Column-algebra TextAnalysis path ([[FingerprintExpr.compute]]). */
  def fingerprint(text: Column): Column =
    ExpressionUtils.column(FingerprintExpr(ExpressionUtils.expression(text)))

  /** Unicode normalization for corpus cleaning (lowercase + accent fold +
    * NFC); single compiled pass ([[NormalizeTextExpr]]). */
  def normalizeText(text: Column): Column =
    ExpressionUtils.column(NormalizeTextExpr(ExpressionUtils.expression(text)))

  /** Gopher-style repetition ratio over non-distinct w-grams; value-
    * identical to the Column-algebra TextAnalysis path in one compiled
    * pass (see [[RepetitionRatioExpr.compute]]). */
  def repetitionRatio(text: Column, w: Int): Column =
    ExpressionUtils.column(RepetitionRatioExpr(ExpressionUtils.expression(text), w))

  /** 64-bit SimHash sketch of the distinct lowercased tokens of `text`;
    * bit-identical to Dedup.simHashColumn (same tokenization, same portable
    * 64-bit md5-prefix token hash, same per-bit majority vote) in one
    * compiled pass instead of 64 interpreted lambda sweeps per token.
    * 64-bit width follows Manku et al. (WWW 2007): banding a narrower
    * sketch floods every bucket at web scale. */
  def simHash(text: Column): Column =
    ExpressionUtils.column(SimHashExpr(ExpressionUtils.expression(text)))

  /** [[graft.text.TextAnalysis.portableHash]] as one compiled call: the
    * Column algebra evaluates md5 + regexp_replace (a regex engine pass
    * per row) + concat + substring + cast; this computes the identical
    * value digit-by-digit from the raw digest ([[portableHashJvm]]).
    * Hot in every hash-derived sampler/filter (bloom positions, shard
    * hashes, salted ranks). */
  def portableHash(c: Column): Column =
    ExpressionUtils.column(PortableHashExpr(ExpressionUtils.expression(c)))

  /** [[graft.text.TextAnalysis.portableHash64]] as one compiled call
    * (md5 + substring + conv replaced by [[portableHash64Jvm]]). */
  def portableHash64(c: Column): Column =
    ExpressionUtils.column(PortableHash64Expr(ExpressionUtils.expression(c)))

  /** Consecutive fixed-width token segments of `text` (last partial),
    * single compiled pass ([[SegmentsExpr]]) — element-identical to the
    * Column algebra (tokenize → transform over windows → array_join),
    * which re-ran an interpreted regex + slice + join chain per window. */
  def segments(text: Column, segTokens: Int): Column =
    ExpressionUtils.column(SegmentsExpr(ExpressionUtils.expression(text), segTokens))

  /** Membership probe into a SORTED long array by binary search — the
    * value-identical replacement for `array_contains` on sorted position
    * sets (Bloom filters): log₂(m) long compares per probe instead of a
    * linear scan of up to m elements. */
  def sortedContains(arr: Column, v: Column): Column =
    ExpressionUtils.column(SortedContainsExpr(
      ExpressionUtils.expression(arr), ExpressionUtils.expression(v)))

  /** Distinct-|∩| and distinct-|∪| of two SORTED string arrays in one
    * merge walk — the value-identical replacement for the
    * size(array_intersect) + size(array_union) pair on pre-sorted sets:
    * no per-pair hash table build, strings compare with early-exit
    * instead of full-length hashing, and both counts come from the one
    * pass. Inputs must be ascending in UTF8String binary order
    * (array_sort's own); duplicates collapse while walking, matching
    * array_intersect/array_union's distinct semantics exactly. */
  def sortedJaccardCounts(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedJaccardExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Tokenization shared by every JVM kernel, replicating
    * TextAnalysis.tokens EXACTLY: collapse regex \s+ to one space, strip
    * edge SPACES only, split on ' '. Java's String.trim would also strip
    * control chars (≤ U+0020) that the Column path and the oracle keep
    * attached to their tokens. */
  def normTokens(raw: String): Array[String] = {
    val collapsed = raw.replaceAll("\\s+", " ")
    val s = collapsed.stripPrefix(" ").stripSuffix(" ")
    if (s.isEmpty) Array("") else s.split(" ")
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** JVM replica of TextAnalysis.portableHash (md5 hex → keep decimal
    * digits → first 8 of zero-padded → long), computed digit-by-digit from
    * the raw digest nibbles — no hex-string allocation on the hot path. */
  def portableHashJvm(s: String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var acc = 0L
    var cnt = 0
    var i = 0
    while (i < d.length && cnt < 8) {
      val hi = (d(i) >> 4) & 0xf
      val lo = d(i) & 0xf
      if (hi < 10 && cnt < 8) { acc = acc * 10 + hi; cnt += 1 }
      if (lo < 10 && cnt < 8) { acc = acc * 10 + lo; cnt += 1 }
      i += 1
    }
    while (cnt < 8) { acc *= 10; cnt += 1 } // right-pad with zeros
    acc
  }

  /** JVM replica of TextAnalysis.portableHash64: first 8 bytes of the md5
    * digest, big-endian, as a signed long — identical to parsing the first
    * 16 hex chars as an unsigned 64-bit value (two's complement). All 64
    * bits uniform, unlike the decimal-digit [[portableHashJvm]]. */
  def portableHash64Jvm(s: String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }
}

case class PortableHashExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "portable_hash"
  override def nullSafeEval(input: Any): Any =
    FastExprs.portableHashJvm(input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.FastExprs.portableHashJvm($c.toString())")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class PortableHash64Expr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "portable_hash64"
  override def nullSafeEval(input: Any): Any =
    FastExprs.portableHash64Jvm(input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.FastExprs.portableHash64Jvm($c.toString())")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SegmentsExpr(child: Expression, segTokens: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "segments"
  override def nullSafeEval(input: Any): Any =
    SegmentsExpr.compute(input.asInstanceOf[UTF8String], segTokens)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SegmentsExpr.compute($c, $segTokens)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SegmentsExpr {
  /** Element-identical to the Column algebra in Dedup.segments:
    * tokens (FastExprs.normTokens — replicates TextAnalysis.tokens
    * exactly, incl. the [""] result on empty text), then consecutive
    * segTokens-token windows (last one partial) re-joined with single
    * spaces. `slice` past the end clamps, so ⌈len/seg⌉ windows. */
  def compute(text: UTF8String, segTokens: Int): ArrayData = {
    val toks = FastExprs.normTokens(text.toString)
    val n = (toks.length + segTokens - 1) / segTokens
    val out = new Array[AnyRef](math.max(n, 0))
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = i * segTokens
      val end = math.min(j + segTokens, toks.length)
      while (j < end) {
        if (j > i * segTokens) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class SortedContainsExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType, containsNull = false), LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "sorted_contains"
  override def nullSafeEval(arr: Any, v: Any): Any =
    SortedContainsExpr.compute(arr.asInstanceOf[ArrayData], v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, v) => s"graft.functions.SortedContainsExpr.compute($a, $v)")
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedContainsExpr {
  /** Binary search over an ascending long array (`sort_array` output).
    * Same answer as array_contains for every sorted input. */
  def compute(arr: ArrayData, v: Long): Boolean = {
    var lo = 0
    var hi = arr.numElements() - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val x = arr.getLong(mid)
      if (x == v) return true
      else if (x < v) lo = mid + 1
      else hi = mid - 1
    }
    false
  }
}

case class SortedJaccardExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("inter", LongType, nullable = false),
    StructField("uni", LongType, nullable = false)))
  override def prettyName: String = "sorted_jaccard_counts"
  override def nullSafeEval(a: Any, b: Any): Any =
    SortedJaccardExpr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SortedJaccardExpr.compute($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedJaccardExpr {
  // null elements sort FIRST (sort_array ascending) and match each other,
  // exactly as array_intersect/array_union treat them
  private def cmpNullsFirst(x: UTF8String, y: UTF8String): Int =
    if (x eq null) { if (y eq null) 0 else -1 }
    else if (y eq null) 1
    else x.compareTo(y)

  /** One merge walk over two ascending (UTF8String binary order, nulls
    * first) string arrays: (distinct |∩|, distinct |∪|) — the same counts
    * size(array_intersect(a,b)) / size(array_union(a,b)) produce for any
    * sorted inputs, duplicates included (runs of equal elements are
    * consumed whole). */
  def compute(a: ArrayData, b: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val na = a.numElements(); val nb = b.numElements()
    def at(arr: ArrayData, k: Int): UTF8String =
      if (arr.isNullAt(k)) null else arr.getUTF8String(k)
    var i = 0; var j = 0
    var inter = 0L; var uni = 0L
    while (i < na && j < nb) {
      val av = at(a, i); val bv = at(b, j)
      val cmp = cmpNullsFirst(av, bv)
      uni += 1
      if (cmp == 0) {
        inter += 1
        i += 1; j += 1
        while (i < na && cmpNullsFirst(at(a, i), av) == 0) i += 1
        while (j < nb && cmpNullsFirst(at(b, j), bv) == 0) j += 1
      } else if (cmp < 0) {
        i += 1
        while (i < na && cmpNullsFirst(at(a, i), av) == 0) i += 1
      } else {
        j += 1
        while (j < nb && cmpNullsFirst(at(b, j), bv) == 0) j += 1
      }
    }
    while (i < na) {
      val av = at(a, i); uni += 1; i += 1
      while (i < na && cmpNullsFirst(at(a, i), av) == 0) i += 1
    }
    while (j < nb) {
      val bv = at(b, j); uni += 1; j += 1
      while (j < nb && cmpNullsFirst(at(b, j), bv) == 0) j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](inter, uni))
  }
}

case class FingerprintExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "doc_fingerprint"
  override def nullSafeEval(input: Any): Any =
    FingerprintExpr.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FingerprintExpr.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FingerprintExpr {
  /** Value-identical to TextAnalysis.fingerprint's Column algebra: rolling
    * polynomial hash acc←(acc·131 + portableHash(tok)) mod 1e9+7 over the
    * in-order (non-distinct) whitespace tokens. The HOF path evaluates
    * Spark's md5 + regexp_replace + substring chain per token,
    * interpreted; this runs the digit-extracting JVM hash in one pass. */
  def compute(text: UTF8String): Long = {
    val toks = FastExprs.normTokens(text.toString)
    var acc = 0L
    var i = 0
    while (i < toks.length) {
      acc = Math.floorMod(acc * 131L + FastExprs.portableHashJvm(toks(i)), 1000000007L)
      i += 1
    }
    acc
  }
}

case class RepetitionRatioExpr(child: Expression, w: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "repetition_ratio"
  override def nullSafeEval(input: Any): Any =
    RepetitionRatioExpr.compute(input.asInstanceOf[UTF8String], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepetitionRatioExpr.compute($c, $w)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionRatioExpr {
  /** Value-identical to TextAnalysis.repetitionRatio's Column algebra
    * ((len(grams) − len(distinct)) / len(grams) over non-distinct w-grams;
    * < w tokens → the single joined-token gram → ratio 0) in one pass over
    * one token array — the HOF path re-slices and re-concats per gram,
    * interpreted, which made q46 the most expensive bench query. */
  def compute(text: UTF8String, w: Int): Double = {
    val toks = FastExprs.normTokens(text.toString)
    if (toks.length < w) return 0.0 // one gram, one distinct
    val n = toks.length - w + 1
    val seen = new java.util.HashSet[String](n * 2)
    var dup = 0
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < w) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      if (!seen.add(sb.toString)) dup += 1
      i += 1
    }
    dup.toDouble / n
  }
}

case class ShinglesExpr(child: Expression, w: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"
  override def nullSafeEval(input: Any): Any =
    ShinglesExpr.compute(input.asInstanceOf[UTF8String], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShinglesExpr.compute($c, $w)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShinglesExpr {
  /** Distinct w-shingles in first-occurrence order — element-identical to
    * the Column algebra (transform over token windows + array_distinct,
    * which also keeps first occurrences) in one pass: one StringBuilder
    * per row instead of an interpreted slice+concat closure per gram.
    * Fewer than w tokens → the single whole-text gram, like the
    * `otherwise` branch of the Column path. */
  def compute(text: UTF8String, w: Int): ArrayData = {
    val toks = FastExprs.normTokens(text.toString)
    val out = new java.util.LinkedHashSet[UTF8String]()
    val sb = new java.lang.StringBuilder()
    if (toks.length >= w) {
      var i = 0
      while (i + w <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < w) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out.add(UTF8String.fromString(sb.toString))
        i += 1
      }
    } else {
      var j = 0
      while (j < toks.length) {
        if (j > 0) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out.add(UTF8String.fromString(sb.toString))
    }
    new GenericArrayData(out.toArray)
  }
}

case class MinHashSignatureExpr(child: Expression, w: Int, k: Int,
                                portable: Boolean = false)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"
  override def nullSafeEval(input: Any): Any =
    MinHashSignatureExpr.compute(input.asInstanceOf[UTF8String], w, k, portable)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSignatureExpr.compute($c, $w, $k, $portable)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignatureExpr {
  val Prime: Long = 2147483647L
  def coeffA(i: Int): Long = 2 * (1103515245L * (i + 1) % (Prime / 2)) + 1
  def coeffB(i: Int): Long = 12345L * (i + 7) % Prime

  /** Single-pass signature: tokenize (FastExprs.normTokens — replicates
    * TextAnalysis.tokens exactly), build distinct w-shingles, base-hash
    * (xxhash64 seed 42, or the portable md5-digit hash), k affine minima.
    * Called from generated code. */
  def compute(text: UTF8String, w: Int, k: Int, portable: Boolean): ArrayData = {
    val toks: Array[String] = FastExprs.normTokens(text.toString)
    val shingles = new java.util.HashSet[String]()
    if (toks.length >= w) {
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i + w <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < w) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
        shingles.add(sb.toString)
        i += 1
      }
    } else shingles.add(toks.mkString(" "))
    val as = Array.tabulate(k)(coeffA)
    val bs = Array.tabulate(k)(coeffB)
    val sig = Array.fill(k)(Long.MaxValue)
    val it = shingles.iterator()
    while (it.hasNext) {
      val sh = it.next()
      val h =
        if (portable) FastExprs.portableHashJvm(sh)
        else {
          val raw = XxHash64Function.hash(UTF8String.fromString(sh), StringType, 42L)
          ((raw % Prime) + Prime) % Prime
        }
      var i = 0
      while (i < k) {
        val v = (h * as(i) + bs(i)) % Prime // no overflow: h,a < 2^31
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    new GenericArrayData(sig)
  }
}

case class SimHashExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def nullSafeEval(input: Any): Any =
    SimHashExpr.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashExpr.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashExpr {
  /** Charikar sketch over distinct lowercased tokens: bit j of the result
    * is 1 iff more token hashes have bit j set than clear. 64-bit wide
    * (Manku et al., WWW 2007) over the full-width portableHash64 token
    * hash, so band keys at maxHamming=3 are 16 bits — the geometry that
    * keeps bucket sizes workable at 10⁹⁺ documents. Lowercasing goes
    * through UTF8String.toLowerCase — the exact code Spark's `lower`
    * expression runs, so this stays bit-identical to the Column path. */
  def compute(text: UTF8String): Long = {
    val toks = FastExprs.normTokens(text.toLowerCase.toString)
    val seen = new java.util.HashSet[String]()
    val counts = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (seen.add(t)) {
        val h = FastExprs.portableHash64Jvm(t)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sketch = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) sketch |= 1L << j; j += 1 }
    sketch
  }
}

case class CosineQExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // NULL vector elements → NULL score
  override def prettyName: String = "cosine_q"
  override def nullSafeEval(a: Any, b: Any): Any =
    CosineQExpr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double r = graft.functions.CosineQExpr.compute($a, $b);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }
    """)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineQExpr {
  /** Returns null (boxed) when any element is NULL — mirrors the oracle's
    * NULL-propagating list arithmetic instead of silently reading 0.
    * Mismatched dimensions throw (like DuckDB's list_dot_product): a
    * corrupt/ragged embedding must fail loudly, not score over a prefix. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"cosine_q: dimension mismatch $n vs ${b.numElements()}")
    var dot = 0L; var aa = 0L; var bb = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getLong(i); val y = b.getLong(i)
      dot += x * y; aa += x * x; bb += y * y
      i += 1
    }
    java.lang.Double.valueOf(
      dot.toDouble / (math.sqrt(aa.toDouble) * math.sqrt(bb.toDouble)))
  }
}

case class QuantizeExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // NULL vector elements → NULL vector
  override def prettyName: String = "quantize_q"
  override def nullSafeEval(input: Any): Any =
    QuantizeExpr.compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.util.ArrayData r =
        graft.functions.QuantizeExpr.compute($c);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r; }
    """)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantizeExpr {
  /** NULL vector elements make the whole quantized vector null (the oracle
    * would propagate the NULL through every downstream dot product anyway). */
  def compute(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      out(i) = math.floor(v.getDouble(i) * 1000.0).toLong
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class SignLshBucketExpr(child: Expression, planes: Seq[Seq[Long]])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "sign_lsh_bucket"
  private lazy val matrix: Array[Array[Long]] = planes.map(_.toArray).toArray
  override def nullSafeEval(input: Any): Any =
    SignLshBucketExpr.compute(input.asInstanceOf[ArrayData], matrix)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshPlanes", matrix, "long[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SignLshBucketExpr.compute($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignLshBucketExpr {
  /** Throws on a vector whose dimension differs from the plane matrix —
    * silently bucketing a ragged embedding over a prefix would diverge
    * from the oracle (whose list_dot_product errors) without a trace. */
  def compute(v: ArrayData, planes: Array[Array[Long]]): Long = {
    var bucket = 0L
    var p = 0
    while (p < planes.length) {
      val row = planes(p)
      val n = row.length
      if (v.numElements() != n)
        throw new IllegalArgumentException(
          s"sign_lsh_bucket: vector dimension ${v.numElements()} != plane dimension $n")
      var dot = 0L
      var d = 0
      while (d < n) { dot += v.getLong(d) * row(d); d += 1 }
      if (dot > 0) bucket += (1L << p)
      p += 1
    }
    bucket
  }
}

/** Johnson–Lindenstrauss sign projection of a quantized long vector — the
  * compiled single-pass twin of
  * [[graft.similarity.Projection.jlProjectColumn]] (bit-identical: same
  * LCG sign matrix, same integer sums). The Column-algebra path evaluates
  * outDim × inDim lambda closures per row; this is one static call inside
  * WholeStageCodegen. */
case class JlProjectExpr(child: Expression, inDim: Int, outDim: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(inDim >= 1 && outDim >= 1, s"jl_project: bad dims $inDim -> $outDim")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "jl_project"
  override def nullSafeEval(input: Any): Any =
    JlProjectExpr.compute(input.asInstanceOf[ArrayData], inDim, outDim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.JlProjectExpr.compute($c, $inDim, $outDim)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JlProjectExpr {
  import graft.similarity.Projection.{SignA, SignC, SignM}

  def compute(v: ArrayData, inDim: Int, outDim: Int): ArrayData = {
    if (v.numElements() != inDim)
      throw new IllegalArgumentException(
        s"jl_project: vector dimension ${v.numElements()} != $inDim")
    val out = new Array[Long](outDim)
    var p = 0
    while (p < outDim) {
      var acc = 0L
      var j = 0
      while (j < inDim) {
        val idx = p.toLong * inDim + j
        val sgn = if (((SignA * idx + SignC) % SignM) % 2 == 0) 1L else -1L
        acc += v.getLong(j) * sgn
        j += 1
      }
      out(p) = acc
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** Product-quantization encode — the compiled twin of
  * [[graft.similarity.Projection.pqEncodeColumn]] (bit-identical
  * arithmetic codebooks and squared-L2 argmin; strict `<` keeps the
  * smallest centroid id on ties, matching array_min's struct order).
  * The Column path evaluates nSub × nCent × subDim nested closures per
  * row (~1 ms/row measured at 64 dims); this is one static call. */
case class PqEncodeExpr(child: Expression, inDim: Int, nSub: Int, nCent: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(inDim % nSub == 0, s"pq_encode: $inDim not divisible by $nSub")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("dist", LongType, nullable = false),
    StructField("code", IntegerType, nullable = false))), containsNull = false)
  override def prettyName: String = "pq_encode"
  override def nullSafeEval(input: Any): Any =
    PqEncodeExpr.compute(input.asInstanceOf[ArrayData], inDim, nSub, nCent)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PqEncodeExpr.compute($c, $inDim, $nSub, $nCent)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncodeExpr {
  import graft.similarity.Projection.{CentA, CentC, CentRange, SignM}

  def compute(v: ArrayData, inDim: Int, nSub: Int, nCent: Int): ArrayData = {
    if (v.numElements() != inDim)
      throw new IllegalArgumentException(
        s"pq_encode: vector dimension ${v.numElements()} != $inDim")
    val subDim = inDim / nSub
    val half = (CentRange - 1) / 2
    val out = new Array[Any](nSub)
    var s = 0
    while (s < nSub) {
      var bestDist = Long.MaxValue
      var bestK = 0
      var k = 0
      while (k < nCent) {
        var dist = 0L
        var d = 0
        while (d < subDim) {
          val flat = (s.toLong * nCent + k) * subDim + d
          val c = ((CentA * flat + CentC) % SignM) % CentRange - half
          val diff = v.getLong(s * subDim + d) - c
          dist += diff * diff
          d += 1
        }
        if (dist < bestDist) { bestDist = dist; bestK = k }
        k += 1
      }
      out(s) = org.apache.spark.sql.catalyst.InternalRow(bestDist, bestK)
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** Unicode text normalization for corpus cleaning: lowercase → NFD →
  * strip combining marks (accent fold) → NFC. One compiled pass; the
  * DuckDB mirror is nfc_normalize(strip_accents(lower(text))). The two
  * engines' accent folding agrees on Latin scripts (the decompose-and-
  * drop-Mn definition); exotic scripts with non-decomposable accents may
  * differ from ICU's unaccent tables — the spec pins the Latin cases. */
case class NormalizeTextExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"
  override def nullSafeEval(input: Any): Any =
    NormalizeTextExpr.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeTextExpr.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeTextExpr {
  import java.text.Normalizer

  def compute(s: UTF8String): UTF8String = {
    // UTF8String.toLowerCase is the exact code Spark's `lower` runs
    val lowered = s.toLowerCase.toString
    val nfd = Normalizer.normalize(lowered, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val c = nfd.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    UTF8String.fromString(Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
  }
}
