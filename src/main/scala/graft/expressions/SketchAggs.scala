package graft.expressions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** The PRODUCTION shapes of o6/o7's sketches: custom aggregates whose
  * buffer IS the sketch state (the [[VectorMeanAgg]] precedent), so a
  * 100 TB profiling pass is ONE ordinary hash aggregate — no per-row
  * register/cell explode, map-side partial merge, constant bytes per
  * group on the shuffle. The composed groupBy forms in
  * [[graft.operators.Sketches]] stay as the oracle-checked reference
  * (DuckDB can replay them); these native forms are spec-asserted
  * bit-equal to them, which certifies the aggregate against the same
  * oracle transitively.
  */

/** HyperLogLog register array over the PRE-MIXED 32-bit hash `h`
  * (the o6 mixer: mod-2^31-guarded Knuth multiply, so 0 ≤ h < 2^32).
  * Register layout is o6's exactly: reg = h % 64, rho = trailing-zero
  * count of the 26-bit suffix + 1, saturating at 27 on an all-zero
  * suffix. eval returns the 64-register max array; the caller derives
  * the estimate with the same closed-form o6 uses (a tiny per-group
  * array fold — the corpus-sized work is all inside this aggregate).
  */
case class HllRegAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  private val m = 64

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def createAggregationBuffer(): Array[Int] = new Array[Int](m)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val reg = (h % m).toInt
      val w = h / m
      val rho = if (w == 0L) 27 else java.lang.Long.numberOfTrailingZeros(w) + 1
      if (rho > buf(reg)) buf(reg) = rho
    }
    buf
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var i = 0
    while (i < m) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Int]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * m)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(m)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(o: Int): HllRegAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllRegAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): HllRegAgg = copy(child = c.head)
  override def prettyName: String = "hll_registers"
}

/** Count-min sketch over raw keys — the TRUE streaming CMS: every
  * input row increments d=4 cells picked by o7's pairwise-independent
  * (a·x+b) mod p mod w hashes (p = 2^31−1, w = 512, the same literal
  * parameters), so the evaluated 2048-cell array equals the composed
  * groupBy sketch cell-for-cell (counter increments commute — the
  * spec asserts it). Cell layout: row i occupies [i·512, (i+1)·512).
  */
case class CmsAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val w = 512
  private val d = 4
  private val as = Array(101L, 1009L, 10007L, 100003L)
  private val bs = Array(17L, 29L, 71L, 113L)
  private val p = 2147483647L

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[Long]
      var i = 0
      while (i < d) {
        buf(i * w + (((as(i) * key + bs(i)) % p) % w).toInt) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < d * w) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * d * w)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(d * w)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): CmsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): CmsAgg = copy(child = c.head)
  override def prettyName: String = "cms_sketch"
}
