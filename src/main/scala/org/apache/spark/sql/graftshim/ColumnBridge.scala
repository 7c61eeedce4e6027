package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column <-> Catalyst Expression
  * converters (Spark 4 wraps Column around ColumnNode; the classic
  * converters live behind a package-private boundary).
  *
  * Why: graft's Column-only helpers (simhash, cosine, minhash sketch)
  * construct native Catalyst expressions DIRECTLY instead of going
  * through session function registration — a Column built via
  * `call_function` resolves its name against whichever session is
  * active at ANALYSIS time, so a Column constructed on a thread with no
  * active/default session (or analyzed against a different session than
  * the one registered at construction) failed with an unresolved
  * function. A directly-constructed expression has no session
  * dependence at all. This shim is the single place the package
  * boundary is crossed; everything else stays in graft.*.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
