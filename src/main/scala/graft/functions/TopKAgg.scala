package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftglue.{Glue => ExpressionUtils}
import org.apache.spark.sql.types._

/** Bounded top-k as aggregate STATE — the scale replacement for the
  * window-rank idiom. `row_number() OVER (PARTITION BY g ORDER BY v)`
  * shuffles and sorts EVERY row of every group to keep k of them; this
  * aggregate keeps a k-element heap per group per partition, so the
  * exchange moves at most groups × partitions × k rows and nothing is
  * ever globally sorted (same partial → merge shape as any hash
  * aggregate — a TakeOrderedAndProject generalized to per-group).
  *
  * Total order: value DESC, then id ASC — ties are deterministic, so the
  * result is partitioning-invariant and replayable in any engine (the
  * oracle's QUALIFY row_number() mirror). Values and ids are longs
  * (route money through DECIMAL cents first, the repo's discipline).
  */
case class TopKLongPairs(child: Expression, k: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with UnaryLike[Expression] {
  require(k >= 1, s"top_k: k must be >= 1, got $k")

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(b: TopKHeap, row: InternalRow): TopKHeap = {
    val v = child.eval(row)
    if (v != null) {
      val s = v.asInstanceOf[InternalRow]
      if (!s.isNullAt(0) && !s.isNullAt(1)) b.offer(s.getLong(0), s.getLong(1))
    }
    b
  }

  override def merge(b: TopKHeap, other: TopKHeap): TopKHeap = {
    var i = 0
    while (i < other.n) { b.offer(other.vs(i), other.ids(i)); i += 1 }
    b
  }

  /** Kept elements sorted best-first (value desc, id asc). */
  override def eval(b: TopKHeap): Any = {
    val idx = (0 until b.n).sortBy(i => (-b.vs(i), b.ids(i)))
    new GenericArrayData(idx.map(i =>
      InternalRow(b.vs(i), b.ids(i)): Any).toArray)
  }

  override def serialize(b: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * b.n)
    bb.putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putLong(b.vs(i)); bb.putLong(b.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val b = new TopKHeap(k)
    var i = 0
    while (i < n) {
      val v = bb.getLong(); val id = bb.getLong()
      b.offer(v, id)
      i += 1
    }
    b
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("v", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def withNewMutableAggBufferOffset(newOffset: Int): TopKLongPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKLongPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKLongPairs =
    copy(child = newChild)
  override def prettyName: String = "top_k_pairs"
}

/** Fixed-capacity binary min-heap rooted at the WORST kept element under
  * the (value desc, id asc) total order, so an incoming better element
  * evicts the root in O(log k). Plain arrays — the state serializes to
  * 16·n bytes and never allocates per offer. */
final class TopKHeap(val k: Int) {
  val vs = new Array[Long](k)
  val ids = new Array[Long](k)
  var n = 0

  /** a strictly worse than b under (v desc, id asc)? */
  @inline private def worse(va: Long, ia: Long, vb: Long, ib: Long): Boolean =
    va < vb || (va == vb && ia > ib)

  def offer(v: Long, id: Long): Unit = {
    if (n < k) {
      var i = n
      vs(i) = v; ids(i) = id; n += 1
      // sift up toward the worst-at-root invariant
      while (i > 0 && worse(vs(i), ids(i), vs((i - 1) / 2), ids((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (worse(vs(0), ids(0), v, id)) {
      vs(0) = v; ids(0) = id
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var w = i
        if (l < n && worse(vs(l), ids(l), vs(w), ids(w))) w = l
        if (r < n && worse(vs(r), ids(r), vs(w), ids(w))) w = r
        if (w == i) done = true else { swap(i, w); i = w }
      }
    }
  }

  @inline private def swap(i: Int, j: Int): Unit = {
    val tv = vs(i); vs(i) = vs(j); vs(j) = tv
    val ti = ids(i); ids(i) = ids(j); ids(j) = ti
  }
}

object TopKAgg {

  /** Top-`k` (value, id) pairs per group, best-first (value desc, id asc).
    * `pair` must be a struct(v: long, id: long) column. */
  def topK(pair: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKLongPairs(ExpressionUtils.expression(pair), k).toAggregateExpression())
}
