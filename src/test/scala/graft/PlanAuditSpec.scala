package graft

/** Global plan invariants over EVERY registered query: catches a class
  * of scale regressions (accidental cross joins, driver-side collects)
  * in one sweep instead of per-query assertions. Builds all physical
  * plans at sf0.001 — planning only, no execution (except d08, whose
  * component loop materializes eagerly by design). */
class PlanAuditSpec extends SparkSuiteBase {

  private val sf = "/root/testdata/sf0.001"

  test("no registered query plans a cartesian product") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n$plan")
    }
  }

  test("every nested-loop join broadcasts its small side") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      // BroadcastNestedLoopJoin is legitimate (q06's tiny range dim);
      // a ShuffledNestedLoop / plain NestedLoop would stream both sides
      assert(!plan.contains("ShuffledNestedLoopJoin"),
        s"$name shuffles a nested-loop join:\n$plan")
    }
  }
}
