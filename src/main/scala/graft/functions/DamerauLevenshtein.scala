package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: TRUE (unrestricted) Damerau-Levenshtein
  * edit distance — insertions, deletions, substitutions, and adjacent
  * transpositions, where a transposed pair MAY be edited again later
  * (distance("CA","ABC") = 2, which the restricted OSA variant cannot
  * see: OSA gives 3). Spark ships `levenshtein` but nothing
  * transposition-aware, and transpositions are the single most common
  * human typo class — the fuzzy-matching verb (d10) under-merges
  * without it.
  *
  * Semantics are pinned to DuckDB 1.0.0's `damerau_levenshtein` so the
  * oracle gate is the engine-independent reference implementation:
  * BYTE-level distance over the UTF-8 encoding (DuckDB:
  * "béta"~"beta" = 2 — the two-byte é costs a substitution plus a
  * deletion), true-DL recurrence (probed: CA~ABC=2, xy~yx=1,
  * smtih~smith=1), verified vector-for-vector in FunctionsSpec.
  *
  * Why a custom Expression (builder preference order (b)): the DP is
  * imperative per-row compute no relational composition expresses; a
  * Scala UDF would box both strings per row and fall out of
  * whole-stage codegen. This stays codegen'd via a static call on the
  * raw UTF8String bytes (the [[SimHashText]] discipline). Null in →
  * null out (standard binary null propagation).
  *
  * Cost is O(|a|·|b|) time and space per row — a string-similarity
  * join must block/cap its candidate pairs regardless (q116 caps
  * blocks at 16), so the quadratic cell count is bounded by the
  * caller's pair discipline, not by data volume. Because the function
  * is registered for general SQL use, inputs are HARD-CAPPED at
  * [[DamerauLevenshtein.MaxBytes]] UTF-8 bytes per side — a caller
  * pointing it at full document bodies gets an immediate
  * IllegalArgumentException naming the bound, not a silent per-row
  * multi-GB matrix allocation and an executor OOM (ADVICE r16). The
  * DP is for short identifier-ish strings (names, SKUs, tokens);
  * document-scale similarity belongs to the shingle/MinHash family. */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein"

  override def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshtein.distance(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.DamerauLevenshtein.distance($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {

  /** Per-side input bound in UTF-8 bytes: 4096² ints ≈ 64 MB is the
    * worst single-row matrix we accept; anything larger is a misuse
    * of a quadratic-space kernel (see class scaladoc). */
  val MaxBytes: Int = 4096

  /** True Damerau-Levenshtein over the raw UTF-8 bytes — the
    * textbook `da`/`db` last-occurrence recurrence (Lowrance &
    * Wagner '75 as commonly stated), byte alphabet (256-slot last-row
    * table). The (len+2)² matrix carries the `maxd` sentinel border
    * the transposition term needs. Inputs beyond [[MaxBytes]] are
    * rejected (IllegalArgumentException) before any allocation. */
  def distance(sa: UTF8String, sb: UTF8String): Int = {
    val a = sa.getBytes; val b = sb.getBytes
    val la = a.length; val lb = b.length
    require(la <= MaxBytes && lb <= MaxBytes,
      s"damerau_levenshtein input exceeds $MaxBytes bytes " +
        s"($la, $lb) — the O(|a|*|b|) DP is for short strings; use the " +
        "shingle/MinHash operators for document-scale similarity")
    if (la == 0) return lb
    if (lb == 0) return la
    val maxd = la + lb
    val da = new Array[Int](256)
    val d = Array.ofDim[Int](la + 2, lb + 2)
    d(0)(0) = maxd
    var i = 0
    while (i <= la) { d(i + 1)(0) = maxd; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= lb) { d(0)(j + 1) = maxd; d(1)(j + 1) = j; j += 1 }
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val k = da(b(j - 1) & 0xFF)
        val l = db
        var cost = 1
        if (a(i - 1) == b(j - 1)) { cost = 0; db = j }
        var m = d(i)(j) + cost                        // substitute / match
        val ins = d(i + 1)(j) + 1                     // insert
        if (ins < m) m = ins
        val del = d(i)(j + 1) + 1                     // delete
        if (del < m) m = del
        val tr = d(k)(l) + (i - k - 1) + 1 + (j - l - 1) // transpose
        if (tr < m) m = tr
        d(i + 1)(j + 1) = m
        j += 1
      }
      da(a(i - 1) & 0xFF) = i
      i += 1
    }
    d(la + 1)(lb + 1)
  }
}
