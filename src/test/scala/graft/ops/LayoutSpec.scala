package graft.ops

import graft.SparkSuiteBase
import org.apache.spark.sql.functions._

/** Layout must never change answers: the bucketed / partitioned copies
  * q30/q31 read are byte-equivalent reorderings of the source tables,
  * so each query must equal the same computation over the originals.
  * (The plan-side claims — zero exchange, partition pruning — live in
  * PlanAuditSpec; the oracle gate re-proves these value checks against
  * DuckDB at sf0.01.) */
class LayoutSpec extends SparkSuiteBase {
  private val sf = "/root/testdata/sf0.001"

  test("q30 equals the same aggregate over the unbucketed tables") {
    val got = Layout.q30BucketedJoin(spark, sf).collect()
    val want = graft.Tables(spark, sf, "lineitem")
      .join(graft.Tables(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy(col("o_orderpriority"))
      .collect()
    assert(got.toSeq == want.toSeq)
  }

  test("bucketed layout write happens once per session and dir") {
    val (lT, _) = Layout.bucketedTables(spark, sf)
    val loc = spark.sql(s"DESCRIBE TABLE EXTENDED $lT")
      .filter(col("col_name") === "Location").head.getString(1)
      .stripPrefix("file:")
    val before = new java.io.File(loc).listFiles().map(_.lastModified).max
    Layout.bucketedTables(spark, sf)
    val after = new java.io.File(loc).listFiles().map(_.lastModified).max
    assert(before == after, "second call rewrote the bucketed layout")
  }

  test("q31 equals the same aggregate over the unpartitioned events") {
    val got = Layout.q31PartitionPruning(spark, sf).collect()
    val want = graft.Tables(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(pmod(col("user_id"), lit(20)).as("bucket"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("bucket"))
      .collect()
    assert(got.toSeq == want.toSeq)
  }
}
