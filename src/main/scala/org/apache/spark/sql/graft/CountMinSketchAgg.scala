package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Count-Min Sketch as a TypedImperativeAggregate —
  * `cms_sketch(hash, d, w)` → array<bigint> of length d·w (row-major d×w
  * counter matrix). The point estimate for a key with hash h is
  * `min_j counts[j·w + bucket(h, j)]`, always ≥ the true count.
  *
  * Hash family: the same fixed permutation algebra as
  * [[MinHashSignature]] — bucket(h, j) = ((h mod p)·a_j + b_j) mod p mod w
  * with a_j = (2654435761·(j+1)) mod p, b_j = (1000003·(j+1)) mod p,
  * p = 2³¹−1 — so a DuckDB oracle can rebuild every bucket count from the
  * raw table with plain BIGINT arithmetic (products < 2⁶², no overflow at
  * any input hash width). Inputs are md5-prefix32 key hashes, shared with
  * the rest of the cross-engine hashing surface.
  *
  * Why an aggregate: frequency estimation over 100 TB cannot group-by the
  * raw keys when the key space is huge (per-URL, per-user, per-n-gram
  * counts) — the exact group-by shuffles O(distinct keys). This sketch is
  * a CONSTANT-SIZE buffer (d·w longs) with map-side partial aggregation:
  * each of 1000 executors ships one d·w matrix into the final merge
  * (elementwise sum — associative and commutative, so the result is
  * deterministic regardless of partitioning), not one row per key.
  * Reference analog: the support operators count product popularity by
  * key; at corpus scale the sketch replaces the exact count wherever an
  * ε-approximate frequency (ε = e/w, δ = e^−d) is acceptable.
  */
case class CountMinSketchAgg(
    hash: Expression,
    d: Int,
    w: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] with ExpectsInputTypes {

  require(d > 0 && w > 0, "cms_sketch: d and w must be positive")

  private val P = 2147483647L // 2^31 - 1, shared with MinHashSignature

  override def child: Expression = hash
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cms_sketch"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val h = hash.eval(input)
    if (h != null) {
      val hm = h.asInstanceOf[Long] % P
      var j = 0
      while (j < d) {
        val b = ((hm * ((2654435761L * (j + 1)) % P) + (1000003L * (j + 1)) % P) % P % w).toInt
        buffer(j * w + b) += 1L
        j += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinSketchAgg =
    copy(hash = newChild)
}
