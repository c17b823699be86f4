package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.{Glue => ExpressionUtils}
import org.apache.spark.sql.types._

/** Element-wise sum of fixed-dimension quantized (long) vectors as a native
  * Catalyst [[TypedImperativeAggregate]] — the distributed building block of
  * centroid computation (k-means/IVF training, per-class mean embeddings).
  *
  * The naive formulation (posexplode → groupBy(group, dim) → sum) shuffles
  * n·d rows; this aggregate's partial state is ONE d-long array per group
  * per partition, merged element-wise — the same partial → exchange → final
  * shape as any hash aggregate, shuffling d·partitions longs total.
  * Integer sums are associative (float sums are not), so results are
  * bit-identical on any partitioning/merge order and replicable in any SQL
  * engine. Null vectors are skipped; a dimension mismatch fails loudly
  * (a silent truncation would corrupt every centroid it touches).
  */
case class VectorSumLong(child: Expression, dim: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {
  require(dim >= 1, s"vector_sum: dim must be >= 1, got $dim")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](dim)

  override def update(b: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"vector_sum: expected dim $dim, got ${arr.numElements()}")
      var i = 0
      while (i < dim) { b(i) += arr.getLong(i); i += 1 }
    }
    b
  }

  override def merge(b: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < dim) { b(i) += other(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = new GenericArrayData(b)

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * dim)
    var i = 0
    while (i < dim) { bb.putLong(b(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val b = new Array[Long](dim)
    val bb = ByteBuffer.wrap(bytes)
    var i = 0
    while (i < dim) { b(i) = bb.getLong(); i += 1 }
    b
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSumLong =
    copy(child = newChild)
  override def prettyName: String = "vector_sum"
}

/** Element-wise min or max of fixed-dimension long vectors — the same
  * d-longs-per-partition partial-state shape as [[VectorSumLong]] (the
  * naive posexplode → groupBy(dim) alternative shuffles n·d rows). min and
  * max are associative and commutative, so the result is partitioning-
  * independent. Feeds [[graft.similarity.Projection.minMaxScale]]: one
  * corpus scan yields the per-dimension bounds. Groups with zero non-null
  * vectors evaluate to NULL (never a sentinel-valued array). */
case class VectorReduceLong(child: Expression, dim: Int, isMin: Boolean,
                            mutableAggBufferOffset: Int = 0,
                            inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {
  require(dim >= 1, s"$prettyName: dim must be >= 1, got $dim")

  private val empty = if (isMin) Long.MaxValue else Long.MinValue

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(dim)(empty)

  @inline private def reduce(a: Long, b: Long): Long =
    if (isMin) math.min(a, b) else math.max(a, b)

  override def update(b: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"$prettyName: expected dim $dim, got ${arr.numElements()}")
      var i = 0
      while (i < dim) { b(i) = reduce(b(i), arr.getLong(i)); i += 1 }
    }
    b
  }

  override def merge(b: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < dim) { b(i) = reduce(b(i), other(i)); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any =
    if (b.forall(_ == empty)) null else new GenericArrayData(b)

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * dim)
    var i = 0
    while (i < dim) { bb.putLong(b(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val b = new Array[Long](dim)
    val bb = ByteBuffer.wrap(bytes)
    var i = 0
    while (i < dim) { b(i) = bb.getLong(); i += 1 }
    b
  }

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def withNewMutableAggBufferOffset(newOffset: Int): VectorReduceLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorReduceLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorReduceLong =
    copy(child = newChild)
  override def prettyName: String = if (isMin) "vector_min" else "vector_max"
}

object VectorAgg {

  /** Element-wise sum of `quantizedVec` (array<long>, fixed `dim`) as an
    * aggregate Column. */
  def vectorSum(quantizedVec: Column, dim: Int): Column =
    ExpressionUtils.column(
      VectorSumLong(ExpressionUtils.expression(quantizedVec), dim)
        .toAggregateExpression())

  /** Element-wise minimum of `quantizedVec` as an aggregate Column. */
  def vectorMin(quantizedVec: Column, dim: Int): Column =
    ExpressionUtils.column(
      VectorReduceLong(ExpressionUtils.expression(quantizedVec), dim, isMin = true)
        .toAggregateExpression())

  /** Element-wise maximum of `quantizedVec` as an aggregate Column. */
  def vectorMax(quantizedVec: Column, dim: Int): Column =
    ExpressionUtils.column(
      VectorReduceLong(ExpressionUtils.expression(quantizedVec), dim, isMin = false)
        .toAggregateExpression())
}
