package graft.ops

import graft.SparkSuiteBase
import org.apache.spark.sql.functions._

/** The c01 composition: stage semantics the oracle can't see (gating
  * monotonicity, quota bound) plus the plan property that makes the
  * chain scale — the text column never crosses an exchange. */
class CurationSpec extends SparkSuiteBase {
  private val sf = "/root/testdata/sf0.001"

  test("c01: quota bound holds and the report covers only gated docs") {
    val out = Curation.c01Curation(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(1) <= 50), "per-source quota violated")
    val kept = out.map(_.getLong(1)).sum
    val en = graft.Tables(spark, sf, "documents")
      .filter(col("lang") === "en").count()
    assert(kept <= en, s"kept $kept docs out of $en english")
  }

  test("c01 plan: no exchange carries the raw text column") {
    val plan = Curation.c01Curation(spark, sf)
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty, s"expected shuffles in:\n$plan")
    assert(!exchanges.exists(_.contains("text#")),
      s"an exchange ships document text:\n${exchanges.mkString("\n")}")
  }
}
