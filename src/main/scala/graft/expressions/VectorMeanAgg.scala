package graft.expressions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise mean of a vector column as a single aggregation.
  *
  * The composable alternative (posexplode → groupBy(pos) → avg →
  * re-assemble) multiplies the row count by the dimensionality (64×
  * here) before the shuffle. This aggregate keeps one (sum[dim],
  * count) buffer per group with map-side partial aggregation, so the
  * shuffle carries one buffer per (group × partition) regardless of
  * corpus size — the IVF centroid build at 100 TB is a normal
  * hash aggregate.
  */
case class VectorMeanAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // buffer = [count, sum_0 … sum_{dim-1}]
  override def createAggregationBuffer(): Array[Double] =
    new Array[Double](dim + 1)

  // element-type dispatch hoisted out of the per-element hot loop
  @transient private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      // a dim mismatch means wrong centroids (silent truncation /
      // zero-padding into the mean) — fail loudly instead
      if (arr.numElements() != dim) {
        throw new IllegalArgumentException(
          s"VectorMeanAgg(dim=$dim) got a vector of length ${arr.numElements()}")
      }
      var i = 0
      if (isFloat) {
        while (i < dim) { buf(i + 1) += arr.getFloat(i).toDouble; i += 1 }
      } else {
        while (i < dim) { buf(i + 1) += arr.getDouble(i); i += 1 }
      }
      buf(0) += 1
    }
    buf
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    var i = 0
    while (i <= dim) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Double]): Any = {
    if (buf(0) == 0) return null
    val out = new Array[Double](dim)
    var i = 0
    while (i < dim) { out(i) = buf(i + 1) / buf(0); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * (dim + 1))
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(dim + 1)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorMeanAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorMeanAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): VectorMeanAgg = copy(child = c.head)
}
