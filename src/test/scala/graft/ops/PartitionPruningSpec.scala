package graft.ops

import java.nio.file.Files
import graft.SparkSuiteBase
import org.apache.spark.sql.functions._

/** Partition pruning — the other half of the pushdown story at 100 TB
  * (a date/tenant-partitioned lake prunes whole directories, not rows).
  * Static pruning: a literal filter on the partition column touches only
  * matching partitions. Dynamic (DPP): a selective dim-side filter
  * prunes fact partitions at runtime through the join. */
class PartitionPruningSpec extends SparkSuiteBase {
  private val sf = "/root/testdata/sf0.001"

  private lazy val partedDir: String = {
    val dir = Files.createTempDirectory("graft-parted").toString
    graft.Tables(spark, sf, "lineitem")
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(dir)
    dir
  }

  test("static partition pruning: literal filter scans only matching partitions") {
    val df = spark.read.parquet(partedDir).filter(col("l_returnflag") === "A")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(l_returnflag"),
      s"no partition filter:\n$scan")
    assert(df.select("l_returnflag").distinct().collect().map(_.getString(0)).toSeq == Seq("A"))
  }

  test("dynamic partition pruning fires through a filtered dim join") {
    import spark.implicits._
    // DPP preconditions: join ON the partition column, a SELECTIVE
    // filter on the dim side, and (by default) a broadcastable dim whose
    // broadcast the pruning subquery can reuse.
    // dim must survive as a real scan+filter (a local Seq folds to a
    // LocalRelation and DPP's selectivity check never sees a filter)
    val dimDir = Files.createTempDirectory("graft-dim").toString
    Seq(("A", 0L), ("N", 0L), ("R", 1L)).toDF("flag", "w")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("w") === 1)
    val fact = spark.read.parquet(partedDir)
    val joined = fact.join(dim, fact("l_returnflag") === dim("flag"))
      .groupBy("l_returnflag").agg(sum("l_quantity"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic pruning in:\n${plan.take(4000)}")
    assert(joined.collect().map(_.getString(0)).toSeq == Seq("R"))
  }

  test("q41: the registered DPP join plans a pruning subquery on the fact scan") {
    val sf = "/root/testdata/sf0.001"
    val plan = Layout.q41DppJoin(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic pruning in q41:\n${plan.take(4000)}")
  }

  test("q40: the grouped min/max/count answers from PushedAggregation, scan reads no data columns") {
    val sf = "/root/testdata/sf0.001"
    val s2 = Layout.q40Session(spark)
    val df = Layout.q40Scan(s2, Layout.eventsPartitioned(spark, sf))
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedAggregation: [COUNT(*), MIN(user_id), MAX(user_id)]"),
      s"aggregates not pushed to the parquet scan:\n${scan.take(4000)}")
  }
}
