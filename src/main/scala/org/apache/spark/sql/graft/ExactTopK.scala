package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-K buffer: keeps the k best (score DESC, payload ASC) entries. */
final class TopKBuffer(val k: Int) {
  // min-heap on the kept set: root = the worst kept entry
  private val heap = new java.util.PriorityQueue[(Double, Long)](
    math.max(k, 1),
    (a: (Double, Long), b: (Double, Long)) => {
      val c = java.lang.Double.compare(a._1, b._1) // lower score = worse
      if (c != 0) c else java.lang.Long.compare(b._2, a._2) // higher payload = worse
    })

  def insert(score: Double, payload: Long): Unit = {
    if (heap.size < k) heap.add((score, payload))
    else {
      val worst = heap.peek()
      if (score > worst._1 || (score == worst._1 && payload < worst._2)) {
        heap.poll(); heap.add((score, payload))
      }
    }
  }

  def entries: Array[(Double, Long)] = heap.toArray(Array.empty[(Double, Long)])

  def mergeFrom(other: TopKBuffer): Unit =
    other.entries.foreach { case (s, p) => insert(s, p) }
}

/** Exact grouped top-K as a TypedImperativeAggregate —
  * `top_k(score, payload, k)` → array<struct<score double, payload bigint>>
  * ordered by score DESC, payload ASC.
  *
  * Why an aggregate and not `row_number().over(...)`: the window form must
  * shuffle and fully sort every group's rows before discarding all but k.
  * This aggregate keeps a bounded heap per group with MAP-SIDE PARTIAL
  * AGGREGATION — each mapper ships at most k entries per group into the
  * shuffle, so grouped top-K over 100 TB shuffles O(groups·k), not O(rows).
  * (Spark's TakeOrderedAndProject does this for global top-K only; the
  * per-group form has no built-in equivalent.)
  */
case class ExactTopK(
    score: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer]
  with BinaryLike[Expression] with ExpectsInputTypes {

  require(k > 0, "k must be positive")

  override def left: Expression = score
  override def right: Expression = payload
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("payload", LongType))),
    containsNull = false)
  override def prettyName: String = "top_k"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val p = payload.eval(input)
    if (s != null && p != null) {
      buffer.insert(s.asInstanceOf[Double], p.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.mergeFrom(other); buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val sorted = buffer.entries.sortBy { case (s, p) => (-s, p) }
    new GenericArrayData(sorted.map { case (s, p) =>
      InternalRow(s, p)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val es = buffer.entries
    val bb = ByteBuffer.allocate(4 + es.length * 16)
    bb.putInt(es.length)
    es.foreach { case (s, p) => bb.putDouble(s); bb.putLong(p) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ExactTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ExactTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ExactTopK =
    copy(score = newLeft, payload = newRight)
}
