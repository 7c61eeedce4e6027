package graft.ops

import graft.SparkSuiteBase
import org.apache.spark.sql.functions._

/** The co-located-join scale story (builder prompt: "use bucketing for
  * co-located joins"): pre-bucketing both join sides on the join key
  * lets a sort-merge join read bucket-aligned files with NO shuffle
  * exchange — at 100 TB this turns the recurring fact-fact join from a
  * full-network shuffle into a local merge. Asserted on the physical
  * plan, not assumed. */
class BucketingSpec extends SparkSuiteBase {
  private val sf = "/root/testdata/sf0.001"

  test("bucketed tables join without a shuffle exchange") {
    val li = graft.Tables(spark, sf, "lineitem")
    val ord = graft.Tables(spark, sf, "orders")
    li.write.mode("overwrite").bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_b")
    ord.write.mode("overwrite").bucketBy(4, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("ord_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      // the join inputs must NOT be re-shuffled: the only Exchange in
      // the plan belongs to the post-join aggregation
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey") &&
        !joinPart.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
