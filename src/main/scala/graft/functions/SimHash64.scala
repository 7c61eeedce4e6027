package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: 64-bit SimHash fingerprint from an array
  * of (token) hashes — bit k of the result is set iff more input hashes
  * have bit k set than not (per-bit majority vote; Charikar, STOC'02).
  *
  * Why a custom Expression (builder prompt preference order (b)): the
  * HOF spelling is 64 independent `aggregate(hs, ...)` passes — 64
  * Catalyst lambda walks over the array per row and an expression tree
  * large enough to dominate janino compile time on a cold session. This
  * generates ONE fused loop with a 64-counter tally (64 ALU ops per
  * element, no per-element lambda machinery, no allocation beyond one
  * int[64]). `nullSafeEval` is the interpreted fallback; both paths
  * agree (DedupSimilaritySpec).
  *
  * Semantics match the HOF spelling exactly: a null element votes
  * "unset" for every bit (the when().otherwise(-1) fallthrough); an
  * empty array yields fingerprint 0 (vote 0 is not > 0).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val cnt = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) {
        var k = 0
        while (k < 64) { cnt(k) -= 1; k += 1 }
      } else {
        val h = a.getLong(i)
        var k = 0
        while (k < 64) {
          cnt(k) += (if (((h >>> k) & 1L) == 1L) 1 else -1)
          k += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var k = 0
    while (k < 64) { if (cnt(k) > 0) fp |= 1L << k; k += 1 }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val k = ctx.freshName("k"); val cnt = ctx.freshName("cnt")
      val h = ctx.freshName("h"); val fp = ctx.freshName("fp")
      s"""
         |int $n = $a.numElements();
         |int[] $cnt = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) {
         |    for (int $k = 0; $k < 64; $k++) $cnt[$k]--;
         |  } else {
         |    long $h = $a.getLong($i);
         |    for (int $k = 0; $k < 64; $k++) {
         |      $cnt[$k] += ((($h >>> $k) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |}
         |long $fp = 0L;
         |for (int $k = 0; $k < 64; $k++) if ($cnt[$k] > 0) $fp |= 1L << $k;
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Native Catalyst expression: SimHash fingerprint straight from TEXT —
  * whitespace tokenization, per-token xxhash64 (same bytes, same seed-42
  * values as Spark's `xxhash64(token)`), and the 64-bit majority tally,
  * all in one static call. Unlike [[SimHash64]] fed from a `transform()`
  * HOF (higher-order functions don't participate in whole-stage codegen,
  * dragging the whole projection to interpreted eval), this expression
  * keeps the projection inside WholeStageCodegen and never materializes
  * a token array or a hash array.
  *
  * Null text yields null (standard unary null propagation; the HOF
  * spelling returned 0 — null is the saner contract and the corpus
  * column is non-null). Empty/whitespace-only text yields 0L. */
case class SimHashText(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_text"

  override def nullSafeEval(input: Any): Any =
    SimHashText.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashText.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashText =
    copy(child = newChild)
}

object SimHashText {
  import org.apache.spark.unsafe.Platform
  import org.apache.spark.unsafe.types.UTF8String

  /** One pass over the lowered UTF-8 bytes: tokens are maximal runs of
    * non-0x20 bytes (0x20 never occurs inside a multi-byte UTF-8
    * sequence, so byte-level splitting is codepoint-safe); each token
    * hashes via catalyst's XXH64 with seed 42 — bit-identical to the
    * `xxhash64(token)` column function (asserted in CodegenSpec). */
  def compute(s: UTF8String): Long = {
    val lower = s.toLowerCase
    val base = lower.getBaseObject
    val off = lower.getBaseOffset
    val n = lower.numBytes
    val cnt = new Array[Int](64)
    var i = 0
    while (i < n) {
      while (i < n && Platform.getByte(base, off + i) == 0x20) i += 1
      val start = i
      while (i < n && Platform.getByte(base, off + i) != 0x20) i += 1
      if (i > start) {
        val h = XXH64.hashUnsafeBytes(base, off + start, i - start, 42L)
        var k = 0
        while (k < 64) {
          cnt(k) += (if (((h >>> k) & 1L) == 1L) 1 else -1)
          k += 1
        }
      }
    }
    var fp = 0L
    var k = 0
    while (k < 64) { if (cnt(k) > 0) fp |= 1L << k; k += 1 }
    fp
  }
}
