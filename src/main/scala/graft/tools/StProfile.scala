package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.Tables

/** Scratch profiling main for the streaming replay harness — splits
  * st05's wall time into slice-collect / query-start / per-trigger /
  * sink-read phases and probes conf variants, so the "replay tax" in
  * PERF.md stays a measured number instead of a guess. Not part of the
  * library surface. */
object StProfile {
  private val runs = new java.util.concurrent.atomic.AtomicInteger()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.names.foreach(n => Tables(spark, sfDir, n).count())

    def stage[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[st05] $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    // Whole-query timings first (as the bench sees it), then the split.
    def whole(label: String): Unit = {
      val t0 = System.nanoTime()
      val n = graft.streaming.Streams.st05StreamingJoin(spark, sfDir).count()
      println(f"[st05] whole/$label%-20s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    whole("1st"); whole("2nd")

    def split(label: String, noDataBatches: Boolean, parts: String): Unit = {
      import spark.implicits._
      println(s"[st05] --- split $label (noDataMicroBatches=$noDataBatches, parts=$parts)")
      val data = stage("collect_slice") {
        Tables(spark, sfDir, "events")
          .filter($"user_id" % 10 === 0 &&
            $"event_type".isin("click", "purchase"))
          .select($"user_id", $"ts", $"event_type", $"value")
          .orderBy($"ts")
          .as[(Long, java.sql.Timestamp, String, Double)]
          .collect()
      }
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.shuffle.partitions", parts)
      s2.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
        noDataBatches.toString)
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, java.sql.Timestamp, String, Double)](
          implicitly[org.apache.spark.sql.Encoder[(Long, java.sql.Timestamp, String, Double)]],
          s2.sqlContext)
      val name = s"graft_stprof_${runs.incrementAndGet()}"
      val q = stage("query_start") {
        graft.streaming.Streams.clickToPurchaseJoin(
            in.toDF().toDF("user_id", "ts", "event_type", "value"), 30)
          .writeStream.format("memory").queryName(name)
          .outputMode(OutputMode.Append).start()
      }
      try {
        val nChunks = 2
        val chunk = math.max(1, (data.length + nChunks - 1) / nChunks)
        var i = 0
        data.grouped(chunk).foreach { c =>
          i += 1
          stage(s"trigger_$i") { in.addData(c.toSeq: _*); q.processAllAvailable() }
        }
        val prog = q.recentProgress
        println(s"[st05] batches=${prog.length} " +
          prog.map(p => s"${p.batchId}:${p.durationMs.get("triggerExecution")}ms/${p.numInputRows}r")
            .mkString(" "))
      } finally stage("stop") { q.stop() }
      val n = stage("sink_read") {
        s2.table(name)
          .select($"user_id", unix_micros($"purchase_ts").as("purchase_ts_us"),
            round($"purchase_value", 2).as("purchase_value"),
            unix_micros($"click_ts").as("click_ts_us"))
          .orderBy($"user_id", $"purchase_ts_us", $"click_ts_us")
          .count()
      }
      println(s"[st05] rows=$n")
    }

    split("baseline_a", noDataBatches = true, parts = "4")
    split("baseline_b", noDataBatches = true, parts = "4")
    split("nodata_off", noDataBatches = false, parts = "4")
    split("nodata_off_b", noDataBatches = false, parts = "4")
    split("parts1", noDataBatches = true, parts = "1")
    split("parts1_nodata", noDataBatches = false, parts = "1")
    spark.stop()
  }
}
