package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the harness parquet tables (TESTDATA.md).
  *
  * Reads go straight to parquet so Catalyst's parquet scan gets column
  * pruning + predicate pushdown for free; at cluster scale the same code
  * works over an object store (s3a/abfs) path. No caching here — each
  * query plans its own scan so `.explain` shows the real pushdown.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark's reader rejects
      // outright (PARQUET_TYPE_ILLEGAL). Read it as a long (nanos since
      // epoch) and convert to a regular microsecond TimestampType here so
      // every downstream operator sees a plain timestamp column.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every harness table as a temp view (for spark.sql queries).
    * Idempotent; cheap (views are lazy plans, no I/O happens here). */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
