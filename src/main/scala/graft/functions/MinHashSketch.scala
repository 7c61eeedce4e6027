package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Custom sketch aggregate: the MinHash signature of a group as ONE
  * `array<long>` column (builder-prompt preference path (b): a custom
  * aggregate for a sketch Spark lacks).
  *
  * Input rows carry two base hashes per shingle (ha, hb); the sketch
  * tracks, for each j < numHashes, min over rows of
  * `ha XOR rotateLeft(hb, j)` — the same Kirsch–Mitzenmacher-style
  * double-hash family as the expression spelling it replaces. Why an
  * aggregate object instead of numHashes separate `min(...)` columns:
  * the 32-column agg was the largest codegen unit in the whole engine
  * (janino compile dominated d02's cold time) and evaluated 32
  * Catalyst expression trees per row; this update loop is one tight
  * Java loop over a primitive buffer, and the partial/final merge is an
  * elementwise min — the same map-side-combine behavior HashAggregate
  * gives built-ins, via ObjectHashAggregate.
  *
  * Buffer = Array[Long] of current minima; serialize is the raw 8-byte
  * big-endian (ByteBuffer default) concatenation, symmetric with
  * deserialize. Null inputs contribute nothing (xxhash64 never yields
  * null in the feeding pipeline).
  */
case class MinHashSketch(
    left: Expression,
    right: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with BinaryLike[Expression]
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  // The expression is SQL-exposed (GraftExtensions), so type misuse —
  // minhash_sketch(string_col, long_col, 32) — must fail at ANALYSIS
  // with a plan-time error, not as a ClassCastException mid-execution.
  // (Covariant Seq[DataType] narrowing: AbstractDataType is
  // private[sql], same trick as CosineSimilarity.)
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)

  // rotations of a 64-bit word give at most 64 distinct hash functions:
  // h_{64+k} would equal h_k, silently duplicating signature components
  require(numHashes > 0 && numHashes <= 64, s"numHashes out of range: $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_sketch"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a != null && b != null) {
      val ha = a.asInstanceOf[Long]
      val hb = b.asInstanceOf[Long]
      var j = 0
      while (j < numHashes) {
        val v = ha ^ java.lang.Long.rotateLeft(hb, j)
        if (v < buf(j)) buf(j) = v
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var j = 0
    while (j < numHashes) {
      if (b2(j) < b1(j)) b1(j) = b2(j)
      j += 1
    }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSketch =
    copy(left = newLeft, right = newRight)
}
