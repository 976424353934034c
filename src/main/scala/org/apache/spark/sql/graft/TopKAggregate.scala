package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded per-group top-k as a NATIVE aggregate: keeps the k best
  * (key DESC, id ASC) long pairs in constant state per group, with
  * map-side partial aggregation — the scale-correct replacement for the
  * window-function top-k idiom. A `row_number() OVER (PARTITION BY g
  * ORDER BY v)` plan must shuffle and SORT every input row of every
  * group before discarding all but k of them; this aggregate ships at
  * most k pairs per group per map partition and never sorts more than
  * its 2k-element buffer at once (classic bounded "top-k combiner").
  * `collect_list`+`slice` has the same plan shape but unbounded state —
  * the whole group materializes in memory before the slice.
  *
  * Keys are 64-bit integers by design: exact fixed-point money (a
  * DECIMAL(18,4) sum's unscaled value) ranks identically to the decimal
  * itself, with none of double's tie ambiguity — determinism is
  * (key DESC, id ASC), total, and engine-independent.
  *
  * Output: `array<struct<key:bigint, id:bigint>>`, sorted. Null keys or
  * ids are skipped (SQL aggregate convention).
  */
case class TopKLongPairs(
    key: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Long, Long)]] {

  require(k > 0, s"k must be positive: $k")

  override def children: Seq[Expression] = Seq(key, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "topk_long_pairs"

  override def createAggregationBuffer(): ArrayBuffer[(Long, Long)] =
    ArrayBuffer.empty

  // (key DESC, id ASC) — the better pair sorts FIRST
  private def better(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Sort best-first and trim to k — amortized via the 2k high-water
    * mark in [[update]]/[[merge]]. */
  private def prune(buf: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] = {
    val sorted = buf.sortWith(better)
    if (sorted.length > k) sorted.take(k) else sorted
  }

  override def update(buf: ArrayBuffer[(Long, Long)],
                      input: InternalRow): ArrayBuffer[(Long, Long)] = {
    val kv = key.eval(input)
    val iv = id.eval(input)
    if (kv == null || iv == null) return buf
    buf += ((kv.asInstanceOf[Long], iv.asInstanceOf[Long]))
    if (buf.length >= 2 * k) prune(buf) else buf
  }

  override def merge(buf: ArrayBuffer[(Long, Long)],
                     other: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] = {
    buf ++= other
    if (buf.length >= 2 * k) prune(buf) else buf
  }

  override def eval(buf: ArrayBuffer[(Long, Long)]): Any =
    new GenericArrayData(prune(buf).map { case (kv, iv) =>
      InternalRow(kv, iv)
    }.toArray[Any])

  override def serialize(buf: ArrayBuffer[(Long, Long)]): Array[Byte] = {
    val pruned = prune(buf) // never ship more than k pairs
    val bb = ByteBuffer.allocate(4 + pruned.length * 16)
    bb.putInt(pruned.length)
    pruned.foreach { case (kv, iv) => bb.putLong(kv); bb.putLong(iv) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[(Long, Long)](n)
    var i = 0
    while (i < n) { buf += ((bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKLongPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKLongPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKLongPairs =
    copy(key = newChildren(0), id = newChildren(1))
}
