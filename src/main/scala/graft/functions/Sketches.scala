package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftglue.{Glue => ExpressionUtils}
import org.apache.spark.sql.types._

/** Bounded KMV state: the `k` smallest DISTINCT 63-bit hash values seen so
  * far. TreeSet keeps it sorted and deduplicated; inserts past capacity
  * evict the current maximum, so the buffer never exceeds k longs. */
final class KmvBuffer(val k: Int) {
  val set = new java.util.TreeSet[java.lang.Long]()
  def insert(v: Long): Unit =
    if (set.size < k) { set.add(v); () }
    else if (v < set.last) { if (set.add(v)) { set.pollLast(); () } }
}

/** KMV ("k minimum values" / bottom-k) distinct-count sketch as a native
  * Catalyst [[TypedImperativeAggregate]] — the scale path for COUNT
  * DISTINCT (Bar-Yossef et al., RANDOM 2002; Beyer et al., SIGMOD 2007).
  *
  * Exact distinct shuffles EVERY distinct value between the partial and
  * final aggregates; this sketch's partial state is at most `k` longs per
  * partition per group, merged by set-union-and-trim — the same partial →
  * exchange → final plan shape as any hash aggregate, with a fixed-size
  * payload. The estimator (see [[Sketches.kmvEstimate]]) is deterministic:
  * the k smallest distinct values of a set are partitioning- and
  * merge-order-invariant, so results are bit-stable across cluster sizes
  * and reproducible in any engine that can sort hashes (the DuckDB oracle
  * replays it with a row_number window).
  *
  * Input must be a 63-bit non-negative uniform hash
  * ([[Sketches.hash63]]) so signed (Spark) and unsigned (other engines)
  * comparisons order identically. Nulls are skipped, matching COUNT
  * DISTINCT semantics. Returns the sketch itself (ascending long array) —
  * estimate derivation stays in Column algebra where the oracle can
  * mirror it.
  */
case class KMinValues(child: Expression, k: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {
  require(k >= 2, s"kmv: k must be >= 2, got $k")

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(b: KmvBuffer, row: InternalRow): KmvBuffer = {
    val v = child.eval(row)
    if (v != null) b.insert(v.asInstanceOf[Long])
    b
  }

  override def merge(b: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    val it = other.set.iterator()
    while (it.hasNext) b.insert(it.next())
    b
  }

  override def eval(b: KmvBuffer): Any = {
    val out = new Array[Long](b.set.size)
    var i = 0
    val it = b.set.iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(b: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * b.set.size)
    val it = b.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val b = new KmvBuffer(k)
    val bb = ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) b.insert(bb.getLong())
    b
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def withNewMutableAggBufferOffset(newOffset: Int): KMinValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KMinValues =
    copy(child = newChild)
  override def prettyName: String = "kmv_sketch"
}

object Sketches {

  /** 2⁶³ as an exact double — the normalization constant of the KMV
    * estimator. One literal shared by the Scala path and the generated
    * oracle SQL so both engines run the identical IEEE operations. */
  val TwoPow63: Double = 9.223372036854775808e18

  /** Portable 63-bit uniform hash: the full-width 64-bit md5-prefix hash
    * logically shifted right once, so every value is non-negative and a
    * signed (Spark long) sort equals an unsigned (DuckDB UBIGINT) sort.
    * DuckDB mirror: `(('0x' || substr(md5(x), 1, 16))::UBIGINT >> 1)::BIGINT`. */
  def hash63(c: Column): Column =
    shiftrightunsigned(graft.text.TextAnalysis.portableHash64(c), 1)

  /** The KMV sketch of `hash63Col` as an aggregate Column: ascending array
    * of the k smallest distinct hashes (shorter than k when the group has
    * fewer distinct values). */
  def kmvSketch(hash63Col: Column, k: Int): Column =
    ExpressionUtils.column(
      KMinValues(ExpressionUtils.expression(hash63Col), k).toAggregateExpression())

  /** Union of two KMV sketches — the k smallest distinct hashes of the
    * merged streams, i.e. EXACTLY the sketch that would have been built
    * over the union of the underlying sets. KMV is fully mergeable
    * (Beyer et al., SIGMOD 2007): sketch unions compose across
    * partitions, tables, or engines without revisiting the data. */
  def kmvUnion(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  /** Union of a whole ARRAY of KMV sketches in one compiled k-way merge
    * ([[KmvMergeExpr]]) — value-identical to folding [[kmvUnion]] over the
    * array (early trimming can never discard one of the global k smallest:
    * a value cut after any partial union is already larger than k values
    * of that union), but one codegen'd pass over already-sorted inputs
    * instead of an interpreted `aggregate` lambda doing
    * array_union+array_sort per step — the q123 sliding-window fold's
    * measured constant-factor hazard. */
  def kmvUnionAll(sketches: Column, k: Int): Column =
    ExpressionUtils.column(
      KmvMergeExpr(ExpressionUtils.expression(sketches), k))

  /** Jaccard similarity estimate between the sets behind two sketches
    * (Beyer et al.): among the union sketch's k smallest hashes, the
    * fraction present in BOTH input sketches. Deterministic — the same
    * integer membership tests on any engine. */
  def kmvJaccard(a: Column, b: Column, k: Int): Column = {
    val u = kmvUnion(a, b, k)
    val common = size(filter(u,
      x => array_contains(a, x) && array_contains(b, x)))
    common.cast("double") / least(size(u), lit(k)).cast("double")
  }

  /** Distinct-count estimate from a [[kmvSketch]] array: exact size when
    * the group never filled the sketch (|distinct| < k — the sketch IS the
    * distinct set), else the KMV estimator (k−1) / R where R = kth smallest
    * hash normalized to [0,1). Integer arithmetic until one double multiply
    * and one divide — bit-portable across engines. */
  def kmvEstimate(sketch: Column, k: Int): Column = {
    val n = size(sketch)
    when(n < k, n.cast("double"))
      .otherwise(
        lit((k - 1).toDouble) * lit(TwoPow63) / element_at(sketch, k).cast("double"))
  }
}

/** K-way merge of an array of KMV sketches (each a SORTED ascending array
  * of distinct non-negative longs) into the k smallest distinct values —
  * a native codegen'd expression (same static-call pattern as
  * [[graft.functions.FingerprintExpr]]), so the post-window projection of
  * q123-style sliding unions stays inside whole-stage codegen. */
case class KmvMergeExpr(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(k >= 2, s"kmv merge: k must be >= 2, got $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_union_all"
  override def nullSafeEval(input: Any): Any =
    KmvMergeExpr.compute(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.KmvMergeExpr.compute($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object KmvMergeExpr {
  /** Merge N sorted distinct long arrays, keeping the k smallest distinct
    * values. Each loop turn advances exactly one input pointer, emitting a
    * value only when it differs from the last emitted — O(N · total) long
    * comparisons for the tiny N (window width) this serves, zero
    * allocation beyond the output. */
  def compute(sketches: org.apache.spark.sql.catalyst.util.ArrayData,
              k: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = sketches.numElements()
    val as = new Array[org.apache.spark.sql.catalyst.util.ArrayData](n)
    val len = new Array[Int](n)
    val idx = new Array[Int](n)
    var total = 0
    var i = 0
    while (i < n) {
      as(i) = sketches.getArray(i)
      len(i) = as(i).numElements()
      total += len(i)
      i += 1
    }
    val out = new Array[Long](math.min(k, total))
    var m = 0
    var last = -1L // hashes are 63-bit non-negative; -1 sentinel is safe
    var exhausted = false
    while (m < k && !exhausted) {
      var best = -1
      var bv = Long.MaxValue
      i = 0
      while (i < n) {
        if (idx(i) < len(i)) {
          val v = as(i).getLong(idx(i))
          if (v < bv) { bv = v; best = i }
        }
        i += 1
      }
      if (best < 0) exhausted = true
      else {
        idx(best) += 1
        if (bv != last) { out(m) = bv; last = bv; m += 1 }
      }
    }
    new GenericArrayData(if (m == out.length) out else out.take(m))
  }
}
