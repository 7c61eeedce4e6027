package graft.ops

import graft.SparkSuiteBase

/** Plan-shape and semantics checks for the relational battery at
  * sf0.001 (value-level correctness is covered by the DuckDB oracle
  * gate; these assert the *physical plans* scale right — pushdown,
  * broadcast, partial aggregation — which the oracle can't see). */
class RelationalSpec extends SparkSuiteBase {
  private val sf = "/root/testdata/sf0.001"

  private def physicalPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q01: filter is pushed down to the parquet scan") {
    val plan = Relational.q01PricingSummary(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"no pushdown in:\n$plan")
  }

  test("q01: aggregation is partial+final (map-side combine before exchange)") {
    val plan = physicalPlan(Relational.q01PricingSummary(spark, sf))
    assert(plan.contains("partial_sum") || plan.contains("partial_"),
      s"no partial aggregation in:\n$plan")
  }

  test("q02: dimension joins broadcast, not shuffle") {
    val plan = physicalPlan(Relational.q02StarJoin(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
  }

  test("q02: column pruning reaches the lineitem scan") {
    val plan = physicalPlan(Relational.q02StarJoin(spark, sf))
    // lineitem has 11 columns; the query needs 3.
    val scanLine = plan.linesIterator.find(l =>
      l.contains("lineitem.parquet") && l.contains("ReadSchema")).getOrElse("")
    assert(scanLine.contains("l_orderkey") && scanLine.contains("l_extendedprice"))
    assert(!scanLine.contains("l_shipdate") && !scanLine.contains("l_comment"),
      s"scan reads more than needed: $scanLine")
  }

  test("q03: top-k compiles to TakeOrderedAndProject, not a global sort") {
    val plan = physicalPlan(Relational.q03TopOrders(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), s"global sort in:\n$plan")
  }

  test("q06: 3-row bucket dim uses a broadcast nested loop, both sides never shuffle") {
    val plan = physicalPlan(Relational.q06RangeJoin(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin"), s"range join plan:\n$plan")
  }

  test("q16: as-of join is a single window pass — no join operator at all") {
    val plan = physicalPlan(Relational.q16AsOfJoin(spark, sf))
    assert(!plan.contains("Join"), s"as-of should be join-free:\n$plan")
    assert(plan.contains("Window"))
  }

  test("semi/anti join row counts are consistent with their complement") {
    val customers = graft.Tables(spark, sf, "customer").count()
    val semi = Relational.q04SemiJoin(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_customers")).head().getLong(0)
    val anti = Relational.q05AntiJoin(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_customers")).head().getLong(0)
    assert(semi + anti == customers)
  }
}
