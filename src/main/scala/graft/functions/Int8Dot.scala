package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: integer dot product of two int8
  * (tinyint) vectors, returning long — the scoring kernel of the
  * quantized ANN cascade ([[graft.Graft.quantizedTopK]]); applied to
  * a vector with itself it is the squared norm, so one expression
  * covers both the score and the normalizers.
  *
  * Why native (same rationale as [[CosineSimilarity]]): the quantized
  * stage streams the ENTIRE index per query batch — this loop is the
  * hot path the 4x bandwidth claim cashes out in, and a
  * `zip_with`+`aggregate` spelling allocates an intermediate array per
  * row while a UDF boxes both arrays.
  *
  * EXACT by construction: every product is |x*y| <= 127^2 and every
  * partial sum fits a long at any plausible dimensionality, so the
  * result is bit-identical across engines and evaluation orders —
  * the property that lets the quantized stage rank candidates with no
  * rounding discipline at all. Null elements count as 0; vectors of
  * differing length compare over the common prefix
  * ([[CosineSimilarity]]'s conventions). */
case class Int8Dot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(ByteType), ArrayType(ByteType))
  override def dataType: DataType = LongType
  override def prettyName: String = "int8_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L
    var i = 0
    while (i < n) {
      val xi: Long = if (x.isNullAt(i)) 0L else x.getByte(i).toLong
      val yi: Long = if (y.isNullAt(i)) 0L else y.getByte(i).toLong
      dot += xi * yi
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName per local: see CosineSimilarity — fixed names break
      // janino when two calls inline into one codegen scope
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |long $dot = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $xi = $a.isNullAt($i) ? 0L : (long) $a.getByte($i);
         |  long $yi = $b.isNullAt($i) ? 0L : (long) $b.getByte($i);
         |  $dot += $xi * $yi;
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8Dot =
    copy(left = newLeft, right = newRight)
}
