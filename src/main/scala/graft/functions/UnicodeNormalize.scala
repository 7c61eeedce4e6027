package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode normalization (NFC/NFD/NFKC/
  * NFKD) of a string column via `java.text.Normalizer`.
  *
  * Why it exists: Spark has no built-in normalization function, yet a
  * web-scale text pipeline MUST canonicalize before hashing — the
  * composed ("é", U+00E9) and decomposed ("e"+U+0301) spellings of the
  * same text are different byte strings, so every dedup fingerprint
  * (d01's xxhash64, d02's shingles, t05's winnowing) silently treats
  * visually-identical documents as distinct until this runs. The
  * normalize-then-fingerprint ordering is the correctness dependency,
  * not a nicety (reference has no counterpart; SURVEY §2b scalar
  * function library).
  *
  * Why native and not a UDF: same boxing rationale as
  * [[CosineSimilarity]] — this sits ahead of the fingerprint kernel on
  * EVERY document, and a Scala UDF would box each row plus break the
  * whole-stage codegen span around it. The generated code calls the
  * JDK's ICU-derived Normalizer directly on the decoded string; the
  * fast path (`Normalizer.isNormalized`, an ASCII-cheap scan) skips
  * the allocation for already-normal text, which at 100 TB is the
  * overwhelming majority of rows.
  *
  * The form is a compile-time constant of the expression (a plan
  * literal, not a column): normalization form is pipeline
  * configuration, and folding it into the expression keeps codegen
  * branch-free. Null in, null out. */
case class UnicodeNormalize(child: Expression, form: String = "NFC")
    extends UnaryExpression with ExpectsInputTypes {

  require(Set("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"unsupported normalization form: $form")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  private def normalize(s: String): String = {
    val f = Normalizer.Form.valueOf(form)
    if (Normalizer.isNormalized(s, f)) s else Normalizer.normalize(s, f)
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = normalize(s)
    if (n eq s) input else UTF8String.fromString(n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val f = s"java.text.Normalizer.Form.$form"
      s"""
         |java.lang.String $s = $c.toString();
         |${ev.value} = java.text.Normalizer.isNormalized($s, $f)
         |  ? $c
         |  : org.apache.spark.unsafe.types.UTF8String.fromString(
         |      java.text.Normalizer.normalize($s, $f));
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): UnicodeNormalize = copy(child = newChild)
}
