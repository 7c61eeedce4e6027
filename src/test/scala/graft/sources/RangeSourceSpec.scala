package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThanOrEqual, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.SparkSuiteBase

class RangeSourceSpec extends SparkSuiteBase {
  import spark.implicits._

  private def read(start: Long, end: Long, splits: Int = 8) =
    spark.read.format("graft.sources.RangeSource")
      .option("start", start.toString).option("end", end.toString)
      .option("splits", splits.toString).load()

  test("scan builder consumes id bounds, returns the rest, plans pruned splits") {
    val sb = new RangeSource.RangeScanBuilder(1, 60000, 8)
    val rest = sb.pushFilters(Array(
      GreaterThanOrEqual("id", 15000L), LessThanOrEqual("id", 45000L),
      EqualTo("bucket", 3L)))
    assert(rest.toSeq == Seq(EqualTo("bucket", 3L)),
      "non-id filter must come back to Spark for post-scan eval")
    assert(sb.pushedFilters().length == 2)
    sb.pruneColumns(StructType(Seq(StructField("id", LongType, false))))
    val scan = sb.build().asInstanceOf[RangeSource.RangeScan]
    assert(scan.description().contains("bounds=[15000..45000]"),
      scan.description())
    assert(scan.readSchema().fieldNames.toSeq == Seq("id"))
    val parts = scan.planInputPartitions()
      .map(_.asInstanceOf[RangeSource.RangePartition])
    assert(parts.head.lo == 15000L && parts.last.hi == 45000L,
      "partitions must cover exactly the pushed bounds")
    assert(parts.map(p => p.hi - p.lo + 1).sum == 30001L)
    // contradictory bounds plan ZERO partitions (no empty-split tasks)
    val sb2 = new RangeSource.RangeScanBuilder(1, 100, 4)
    sb2.pushFilters(Array(GreaterThanOrEqual("id", 90L),
      LessThanOrEqual("id", 10L)))
    assert(sb2.build().asInstanceOf[RangeSource.RangeScan]
      .planInputPartitions().isEmpty)
  }

  test("pushdown is visible in the executed plan and values are right") {
    val df = read(1, 1000, 4).filter($"id" >= 100 && $"id" <= 200)
      .select($"id", $"tag")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bounds=[100..200]"), plan)
    val rows = df.collect()
    assert(rows.length == 101)
    assert(rows.map(_.getLong(0)).min == 100L)
    // tag is the engine-neutral md5-of-decimal-string prefix
    val tag100 = java.security.MessageDigest.getInstance("MD5")
      .digest("100".getBytes("UTF-8")).take(6)
      .map(b => f"${b & 0xff}%02x").mkString
    assert(rows.find(_.getLong(0) == 100L).get.getString(1) == tag100)
  }

  test("unhandled filter still applied by Spark; pruned read skips tag") {
    val got = read(1, 500, 4).filter($"bucket" === 3L)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(got == (1L to 500L).filter(_ % 97 == 3))
    // column pruning reaches the scan: only id is read (a bare
    // count(*) prunes even further — to ZERO columns)
    val df = read(1, 500, 4).agg(sum($"id"))
    val scanLine = df.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("graft_range bounds")).getOrElse("")
    assert(scanLine.contains("columns=id") && !scanLine.contains("tag"),
      scanLine)
  }
}
