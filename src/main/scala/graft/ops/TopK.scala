package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.{shims => ExpressionUtils}
import org.apache.spark.sql.types._

/** `topk_min(expr, k)` → array: the k SMALLEST values of `expr` per group,
  * ascending, under the type's natural SQL ordering (struct ordering is
  * lexicographic by field, so `topk_min(struct(-score, token), k)` is
  * "top k by score desc, token asc").
  *
  * This is the PARTIAL-TOP-K aggregation shape: a bounded k-element heap
  * per group on the map side, merged heap-to-heap after a shuffle that
  * carries at most k rows per (partition, group) — where the equivalent
  * `row_number() OVER (PARTITION BY g ORDER BY ...) <= k` window must
  * shuffle and SORT every input row. For x22's per-doc TF-IDF top-3 the
  * window form moves the whole (doc, token) frame; this form moves 3 rows
  * per doc per map partition. Memory is O(k) per open group (an
  * ObjectHashAggregate), independent of group size — the difference
  * between a bounded and an unbounded `collect_list`-then-slice.
  *
  * k is a plan-time constant expected small (top-N per entity); the heap
  * is an insertion-sorted array, O(k) per update worst case but hit only
  * while the candidate beats the current k-th value. */
case class TopKMinExpr(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKMinExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKMinExpr =
    copy(inputAggBufferOffset = newOffset)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  @transient private lazy val ord: Ordering[Any] = child.dataType match {
    case st: StructType =>
      // struct values ARE InternalRows: order them field-by-field directly,
      // skipping the one-column-row wrapper (this is the hot compare in the
      // fast-reject path — one per input row once a group's heap is full)
      val rowOrd = org.apache.spark.sql.catalyst.expressions.InterpretedOrdering
        .forSchema(st.map(_.dataType))
      (a: Any, b: Any) =>
        rowOrd.compare(a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow])
    case dt =>
      val rowOrd = org.apache.spark.sql.catalyst.expressions.InterpretedOrdering
        .forSchema(Seq(dt))
      // forSchema orders single-column ROWS; adapt to bare values.
      val holderA = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val holderB = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      (a: Any, b: Any) => {
        holderA.update(0, a); holderB.update(0, b)
        rowOrd.compare(holderA, holderB)
      }
  }

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty[Any]

  /** Insert `v` (already safe to retain) keeping the buffer ascending and
    * at most k long. */
  private def insert(buf: mutable.ArrayBuffer[Any], v: Any): Unit = {
    if (buf.length == k && ord.compare(v, buf.last) >= 0) return
    var i = buf.length
    while (i > 0 && ord.compare(v, buf(i - 1)) < 0) i -= 1
    buf.insert(i, v)
    if (buf.length > k) buf.remove(k)
    ()
  }

  override def update(buf: mutable.ArrayBuffer[Any], input: InternalRow): mutable.ArrayBuffer[Any] = {
    val v = child.eval(input)
    if (v != null) {
      // fast reject before paying the copy: only candidates that beat the
      // current k-th value are retained
      if (buf.length < k || ord.compare(v, buf.last) < 0)
        insert(buf, InternalRow.copyValue(v))
    }
    buf
  }

  override def merge(buf: mutable.ArrayBuffer[Any], other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    other.foreach(insert(buf, _)) // already copies from deserialize
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buf.toArray)

  // One-column UnsafeRow per element, length-prefixed — works for any
  // orderable child type including structs.
  @transient private lazy val ser = UnsafeProjection.create(Array(child.dataType))
  @transient private lazy val holder =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)

  override def serialize(buf: mutable.ArrayBuffer[Any]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { v =>
      holder.update(0, v)
      val row = ser(holder)
      out.writeInt(row.getSizeInBytes)
      row.writeToStream(out, null)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Any] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(1)
      row.pointTo(rowBytes, len)
      buf += InternalRow.copyValue(row.get(0, child.dataType))
      i += 1
    }
    buf
  }

  override def prettyName: String = "topk_min"
}

object TopK {
  /** The k smallest values of `c` per group, ascending (see [[TopKMinExpr]]). */
  def topk_min(c: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKMinExpr(ExpressionUtils.expression(c), k).toAggregateExpression())
}
