package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables
import graft.ops.TextDedup

/** Scratch profiling main — times each stage of a slow query separately
  * so regressions localize to a stage instead of a whole pipeline. Not
  * part of the library surface. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.sql(
      """SELECT r, count(*) FROM (
        |  SELECT id, row_number() OVER (PARTITION BY id % 7 ORDER BY id) AS r,
        |         regexp_replace(cast(id AS string), '0', 'x') AS s,
        |         explode(array(id, id + 1)) AS e
        |  FROM range(10000)) t
        |JOIN (SELECT id AS j FROM range(1000)) u ON t.id = u.j
        |GROUP BY r""".stripMargin).collect()
    graft.Tables.names.foreach(n => graft.Tables(spark, sfDir, n).count())

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }

    val docs = Tables(spark, sfDir, "documents")
    docs.count() // warm the footer cache

    time("d01_1st") { TextDedup.d01ExactDedup(spark, sfDir).count() }
    time("d01_2nd") { TextDedup.d01ExactDedup(spark, sfDir).count() }
    time("t05_1st") { graft.ops.TextAnalysis.t05Winnow(spark, sfDir).count() }
    time("t05_2nd") { graft.ops.TextAnalysis.t05Winnow(spark, sfDir).count() }
    time("shingles_only") {
      docs.select(org.apache.spark.sql.functions.explode(
        TextDedup.shingles(org.apache.spark.sql.functions.col("text")))).count()
    }
    time("minhash_sig") { TextDedup.minhashSig(docs, 64).count() }
    time("candidates") { TextDedup.minhashCandidates(docs, 16, 4).count() }
    time("d02_full_1st") { TextDedup.d02MinhashLsh(spark, sfDir).count() }
    time("d02_full_2nd") { TextDedup.d02MinhashLsh(spark, sfDir).count() }
    // Split planning from execution on a warm plan.
    val d02 = TextDedup.d02MinhashLsh(spark, sfDir)
    time("d02_plan_only") { d02.queryExecution.executedPlan; 0L }
    time("d02_exec_only") { d02.count() }
    time("d02_recount") { d02.count() }
    spark.stop()
  }
}
