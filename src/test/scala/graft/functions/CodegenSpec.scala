package graft.functions

import graft.SparkSuiteBase
import org.apache.spark.sql.functions._

/** Proves the custom expression stays INSIDE whole-stage codegen (the
  * entire point of writing doGenCode instead of a UDF). */
class CodegenSpec extends SparkSuiteBase {
  import spark.implicits._

  test("cosine_sim evaluates inside a WholeStageCodegen stage") {
    GraftFunctions.register(spark)
    // parquet-backed input: a local literal would be constant-folded
    // into a LocalTableScan before any codegen happens
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val df = emb.select(
      call_function("cosine_sim", $"embedding", $"embedding").as("c"))
    val plan = df.queryExecution.executedPlan
    val codegenStages = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenStages.nonEmpty, s"no codegen stage:\n$plan")
    assert(codegenStages.exists(_.toString.contains("cosine_sim")),
      s"cosine_sim not inside codegen:\n$plan")
    // and the generated java actually contains our fused kernel
    val sources = org.apache.spark.sql.execution.debug.codegenStringSeq(plan)
    assert(sources.exists(_._2.contains("Math.sqrt")),
      "generated code missing the cosine kernel")
  }
}
