package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.{shims => ExpressionUtils}
import org.apache.spark.sql.types._

/** Element-wise integer vector aggregates over `array<long>` rows — the
  * moment-matrix shape (x132/x106): Σx per dimension and the full d²
  * outer-product sum Σ x_i·x_j, computed in ONE corpus pass each.
  *
  * Why not posexplode + groupBy: exploding d (or d²) struct rows per input
  * row through a hash aggregate allocates and hashes corpus·d² rows (29 M
  * at sf0.1 for d=64), and the nested `transform` lambdas that build them
  * evaluate interpreted (HigherOrderFunction has no codegen). Here the
  * per-row work is a tight multiply-add loop into one long buffer, the
  * shuffle carries ONE d²-cell array per map partition, and the cross-row
  * sums stay exact order-free integer adds — bit-identical to the
  * exploded form's sums.
  *
  * Overflow posture (r16 ADVICE: guarded, not just documented): with
  * |x| ≤ B the outer-sum cell magnitude is ≤ rows·B². x132's code units
  * have B ≈ 10³ (products ≤ ~10⁶), so a signed long overflows only past
  * ~9·10¹² rows — ~40× beyond a 100 TB embedding corpus (~2·10¹¹ rows at
  * 64 dims). Out-of-contract inputs now RAISE instead of silently
  * wrapping: every accumulation goes through `Math.addExact` (an
  * intrinsic — the overflow check is a branch the predictor never takes
  * on valid data), and the outer product additionally asserts
  * |x| ≤ 2²⁰ per element so the d² products themselves cannot overflow
  * before the guarded add sees them. The downstream decimal(38,0)
  * arithmetic is unchanged; only the raw moment sums ride in longs. */
abstract class LongVecAgg extends TypedImperativeAggregate[Array[Long]] {
  def child: Expression
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** Buffer length for an input vector of length d. */
  protected def bufLen(d: Int): Int
  /** Fold one input vector into the buffer. */
  protected def fold(buf: Array[Long], v: ArrayData): Unit

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val b =
      if (buf.length > 0) buf
      else new Array[Long](bufLen(arr.numElements()))
    require(b.length == bufLen(arr.numElements()),
      s"$prettyName: input vector length changed mid-group " +
        s"(buffer ${b.length}, row d=${arr.numElements()})")
    fold(b, arr)
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.length == 0) return b
    if (b.length == 0) return a
    require(a.length == b.length,
      s"$prettyName: merging buffers of different vector lengths")
    var i = 0
    while (i < a.length) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(4 + 8 * buf.length)
    out.putInt(buf.length)
    var i = 0
    while (i < buf.length) { out.putLong(buf(i)); i += 1 }
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    val n = in.getInt()
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = in.getLong(); i += 1 }
    buf
  }
}

/** `vec_sum(q)` → array<long>: element-wise Σ over the group's vectors. */
case class VecSumExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends LongVecAgg {
  override protected def bufLen(d: Int): Int = d
  override protected def fold(buf: Array[Long], v: ArrayData): Unit = {
    var i = 0
    while (i < buf.length) { buf(i) = Math.addExact(buf(i), v.getLong(i)); i += 1 }
  }
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): VecSumExpr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecSumExpr =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "vec_sum"
}

/** `outer_sum(q)` → array<long> of length d², row-major: Σ q[i]·q[j] over
  * the group's vectors — the raw second-moment matrix in one pass. */
case class OuterSumExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends LongVecAgg {
  override protected def bufLen(d: Int): Int = d * d
  override protected def fold(buf: Array[Long], v: ArrayData): Unit = {
    val d = v.numElements()
    val x = new Array[Long](d)
    var i = 0
    while (i < d) {
      val xi = v.getLong(i)
      // |x| ≤ 2²⁰ keeps every product below 2⁴⁰ — overflow-free before
      // the guarded add; anything larger is out of the documented input
      // contract and must fail loudly, not wrap.
      if (xi > OuterSumExpr.MaxAbs || xi < -OuterSumExpr.MaxAbs)
        throw new ArithmeticException(
          s"outer_sum: |element| $xi exceeds the 2^20 input bound")
      x(i) = xi
      i += 1
    }
    i = 0
    while (i < d) {
      val xi = x(i)
      val base = i * d
      var j = 0
      while (j < d) { buf(base + j) = Math.addExact(buf(base + j), xi * x(j)); j += 1 }
      i += 1
    }
  }
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): OuterSumExpr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): OuterSumExpr =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "outer_sum"
}

object OuterSumExpr {
  /** Per-element magnitude bound: products of two in-bound elements stay
    * below 2⁴⁰, so only the (addExact-guarded) accumulation can overflow. */
  val MaxAbs: Long = 1L << 20
}

object VecAgg {
  def vec_sum(c: Column): Column =
    ExpressionUtils.column(
      VecSumExpr(ExpressionUtils.expression(c)).toAggregateExpression())
  def outer_sum(c: Column): Column =
    ExpressionUtils.column(
      OuterSumExpr(ExpressionUtils.expression(c)).toAggregateExpression())
}
