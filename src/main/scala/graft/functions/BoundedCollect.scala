package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** collect_list with a hard cap: stops accumulating past `limit + 1`
  * elements, so a degenerate group (the LSH boilerplate-bucket skew
  * case) costs O(limit) memory instead of materializing millions of
  * members in a non-spillable aggregation buffer before a size filter
  * throws them away. A result longer than `limit` means "over cap" —
  * callers filter on `size(...) <= limit` exactly as with collect_list,
  * but the buffer never grows past limit + 1.
  */
case class BoundedCollectLong(
    child: Expression,
    limit: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Long]] {

  override def createAggregationBuffer(): ArrayBuffer[Long] = ArrayBuffer.empty

  override def update(buf: ArrayBuffer[Long],
      input: org.apache.spark.sql.catalyst.InternalRow): ArrayBuffer[Long] = {
    if (buf.length <= limit) {
      val v = child.eval(input)
      if (v != null) buf += v.asInstanceOf[Long]
    }
    buf
  }

  override def merge(buf: ArrayBuffer[Long],
      other: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    val room = limit + 1 - buf.length
    if (room > 0) buf ++= other.take(room)
    buf
  }

  override def eval(buf: ArrayBuffer[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: ArrayBuffer[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.length * 8)
    bb.putInt(buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[Long](n)
    (0 until n).foreach(_ => buf += bb.getLong)
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_bounded_collect"

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedCollectLong =
    copy(child = newChildren.head)
}

/** String twin of [[BoundedCollectLong]] — the same O(limit) buffer
  * bound for non-integral group members (uuid/string ids in the LSH
  * bucket paths). Buffers UTF8String copies (the input row's bytes are
  * reused by Spark after eval returns). */
case class BoundedCollectString(
    child: Expression,
    limit: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[UTF8String]] {

  override def createAggregationBuffer(): ArrayBuffer[UTF8String] =
    ArrayBuffer.empty

  override def update(buf: ArrayBuffer[UTF8String],
      input: org.apache.spark.sql.catalyst.InternalRow): ArrayBuffer[UTF8String] = {
    if (buf.length <= limit) {
      val v = child.eval(input)
      if (v != null) buf += v.asInstanceOf[UTF8String].clone()
    }
    buf
  }

  override def merge(buf: ArrayBuffer[UTF8String],
      other: ArrayBuffer[UTF8String]): ArrayBuffer[UTF8String] = {
    val room = limit + 1 - buf.length
    if (room > 0) buf ++= other.take(room)
    buf
  }

  override def eval(buf: ArrayBuffer[UTF8String]): Any =
    new GenericArrayData(buf.toArray[Any])

  override def serialize(buf: ArrayBuffer[UTF8String]): Array[Byte] = {
    val bytes = buf.map(_.getBytes)
    val bb = java.nio.ByteBuffer.allocate(4 + bytes.map(4 + _.length).sum)
    bb.putInt(bytes.length)
    bytes.foreach { b => bb.putInt(b.length); bb.put(b) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[UTF8String] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[UTF8String](n)
    (0 until n).foreach { _ =>
      val b = new Array[Byte](bb.getInt)
      bb.get(b)
      buf += UTF8String.fromBytes(b)
    }
    buf
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_bounded_collect_str"

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectString =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectString =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedCollectString =
    copy(child = newChildren.head)
}

object BoundedCollect {
  /** Column form; `c` must be LongType (cast integral ids first).
    * `limit` is clamped to Int.MaxValue - 1 here so every caller is
    * safe: merge() computes `limit + 1`, which would overflow to
    * Int.MinValue at limit = Int.MaxValue and silently discard merged
    * partial buffers (losing true candidate pairs). */
  def longs(c: Column, limit: Int): Column = ColumnBridge.column(
    BoundedCollectLong(ColumnBridge.expression(c),
      math.min(limit, Int.MaxValue - 1)).toAggregateExpression())

  /** Column form for StringType members; same cap semantics. */
  def strings(c: Column, limit: Int): Column = ColumnBridge.column(
    BoundedCollectString(ColumnBridge.expression(c),
      math.min(limit, Int.MaxValue - 1)).toAggregateExpression())
}
