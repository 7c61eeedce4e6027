package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Deterministic per-group k-reservoir sample as ONE `array<long>`
  * column (builder-prompt preference path (b): a custom aggregate for
  * an operator Spark lacks — `TABLESAMPLE` has no per-GROUP form and
  * `rand()`-ranked sampling is neither deterministic nor mergeable).
  *
  * "Reservoir" in the bottom-k spelling: each input row carries a
  * salted hash (`hash`, computed by the caller — any uniform 64-bit
  * function of the row identity works; t37 feeds an md5-derived long
  * so the DuckDB oracle can replay the identical order) and a payload;
  * the group's sample is the `k` payloads with the SMALLEST
  * (hash, payload) pairs. Bottom-k-by-hash is the classic distributed
  * reservoir: single pass, O(k) state per group, and the merge of two
  * partial reservoirs is the bottom-k of their union — exactly the
  * partial/final split HashAggregate needs, with none of the
  * order-dependence a classic Vitter reservoir has (same sample on
  * every run, every partitioning, every retry — the determinism the
  * oracle gate requires).
  *
  * The payload participates in the order as the tie-break, so equal
  * hashes (or deliberately coarse ones) still yield one well-defined
  * sample. Output: payloads sorted by (hash, payload) ascending —
  * position IS the sample rank.
  *
  * Buffer = a bounded max-heap of (hash, payload): `update` offers and
  * evicts the largest beyond k, so memory is O(k) regardless of group
  * size. Serialize = the flattened pairs (ByteBuffer big-endian),
  * symmetric with deserialize. Null hash or payload contributes
  * nothing.
  */
case class ReservoirSample(
    hash: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.PriorityQueue[(Long, Long)]]
  with BinaryLike[Expression]
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  require(k > 0, s"reservoir size must be positive: $k")

  override def left: Expression = hash
  override def right: Expression = payload

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "reservoir_sample"

  // max-heap on (hash, payload): the head is the WORST kept pair, the
  // one a smaller incoming pair evicts
  override def createAggregationBuffer(): scala.collection.mutable.PriorityQueue[(Long, Long)] =
    scala.collection.mutable.PriorityQueue.empty[(Long, Long)](
      Ordering.Tuple2[Long, Long])

  private def offer(buf: scala.collection.mutable.PriorityQueue[(Long, Long)],
      h: Long, v: Long): Unit = {
    if (buf.size < k) buf.enqueue((h, v))
    else if (Ordering.Tuple2[Long, Long].lt((h, v), buf.head)) {
      buf.dequeue()
      buf.enqueue((h, v))
    }
  }

  override def update(
      buf: scala.collection.mutable.PriorityQueue[(Long, Long)],
      input: InternalRow): scala.collection.mutable.PriorityQueue[(Long, Long)] = {
    val h = hash.eval(input)
    val v = payload.eval(input)
    if (h != null && v != null)
      offer(buf, h.asInstanceOf[Long], v.asInstanceOf[Long])
    buf
  }

  override def merge(
      b1: scala.collection.mutable.PriorityQueue[(Long, Long)],
      b2: scala.collection.mutable.PriorityQueue[(Long, Long)])
      : scala.collection.mutable.PriorityQueue[(Long, Long)] = {
    b2.foreach { case (h, v) => offer(b1, h, v) }
    b1
  }

  override def eval(
      buf: scala.collection.mutable.PriorityQueue[(Long, Long)]): Any =
    new GenericArrayData(buf.toArray.sorted.map(_._2))

  override def serialize(
      buf: scala.collection.mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.size * 16)
    buf.foreach { case (h, v) => bb.putLong(h).putLong(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : scala.collection.mutable.PriorityQueue[(Long, Long)] = {
    val buf = createAggregationBuffer()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    var i = 0
    val n = bytes.length / 16
    while (i < n) {
      buf.enqueue((bb.getLong(), bb.getLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ReservoirSample =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ReservoirSample =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ReservoirSample =
    copy(hash = newLeft, payload = newRight)
}
