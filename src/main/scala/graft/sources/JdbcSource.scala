package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Partitioned JDBC source read — the scale half of the S5 JDBC story
  * (the sink half is [[Sinks.jdbcAppend]]). A plain `read.jdbc(table)`
  * is ONE task pulling the whole table through one connection — the
  * single-node shape the reference's `pd.read_sql` has
  * (`/root/reference/Sample-Json-to-SQL-Full-Pipeline-EO-10-03-2019.py:130-147`
  * reads config tables whole). Supplying a numeric partition column
  * plus bounds makes Spark issue `numPartitions` range-predicated
  * queries in parallel, one per task — the only way a 10^9-row
  * relational extract saturates a cluster instead of one socket.
  *
  * Bounds only steer the split points: rows OUTSIDE [lower, upper]
  * are still read (Spark leaves the first/last stride unbounded), so
  * a stale bounds estimate skews parallelism, never correctness.
  * Skewed key ranges skew stride sizes the same way — derive bounds
  * from `SELECT min(col), max(col)` where cheap. */
object JdbcSource {
  def jdbcPartitioned(spark: SparkSession, url: String, table: String,
      partitionCol: String, lower: Long, upper: Long, numPartitions: Int,
      user: String = "", password: String = ""): DataFrame = {
    val props = new java.util.Properties()
    if (user.nonEmpty) { props.put("user", user); props.put("password", password) }
    spark.read.jdbc(url, table, partitionCol, lower, upper, numPartitions, props)
  }
}
