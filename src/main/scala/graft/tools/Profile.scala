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

    // d11 stage split: where do its ~3 s go? (edges pair scan vs the
    // eager component loop's fixed per-round job overhead)
    {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val emb = Tables(spark, sfDir, "embeddings")
      time("d11_full_1st") { graft.ops.Similarity.d11SemanticDedup(spark, sfDir).count() }
      // the ONE shared centroid builder (Graft.labelCentroids) — an
      // inline copy here once drifted from the query path (ADVICE r5)
      val cent = graft.Graft.labelCentroids(emb, "label", "embedding")
        .select(col("__lbl").as("cluster"), col("__cv").as("cv"))
      val asg = emb.select(col("vec_id"), col("embedding")).crossJoin(cent)
        .select(col("vec_id"), col("embedding"), col("cluster"),
          graft.ops.Similarity.cosine(col("embedding"), col("cv")).as("cos"))
        .groupBy(col("vec_id"))
        .agg(max(struct(col("cos"), col("cluster"), col("embedding"))).as("best"))
        .select(col("vec_id"), col("best.cluster").as("cluster"),
          col("best.embedding").as("v"))
      time("d11_assign_only") { asg.count() }
      val asgC = asg.localCheckpoint(true)
      val edges = asgC.select(col("cluster"), col("vec_id").as("id_a"), col("v").as("va"))
        .join(asgC.select(col("cluster"), col("vec_id").as("id_b"), col("v").as("vb")),
          "cluster")
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          graft.ops.Similarity.cosine(col("va"), col("vb")).as("cos"))
        .filter(col("cos") >= 0.35)
        .select(col("id_a"), col("id_b"))
      time("d11_edges_only") { edges.count() }
      time("d11_components") { TextDedup.componentMin(edges).count() }
    }

    // q76 stage split: co-occurrence edge build vs adjacency intersection
    {
      import org.apache.spark.sql.functions._
      val op = Tables(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val a = op.toDF("o", "p1"); val b = op.toDF("o", "p2")
      val edges = a.join(b, "o").filter(col("p1") < col("p2"))
        .select(col("p1").as("src"), col("p2").as("dst"))
      time("q76_edges_distinct") { edges.distinct().count() }
      time("q76_triangles_full") { graft.Graft.triangles(edges).count() }
      time("q76_full_1st") { graft.ops.Relational.q76Triangles(spark, sfDir).count() }
      time("q76_full_2nd") { graft.ops.Relational.q76Triangles(spark, sfDir).count() }
    }

    // q70 stage split: edge build + checkpoint vs the iteration loop
    {
      import org.apache.spark.sql.functions._
      val pairs = Tables(spark, sfDir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      time("q70_pairs_distinct") { pairs.count() }
      // same long node encoding (2k / 2k+1) as q70PageRank, so these
      // stage timings measure the registered query's plan, not a
      // string-hashing variant (r12 ADVICE)
      val fwd = pairs.select(
        (col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      val edges = fwd.unionAll(fwd.select(col("dst").as("src"), col("src").as("dst")))
      time("q70_pagerank_1it") { graft.Graft.pageRank(edges, 1).count() }
      time("q70_pagerank_3it") { graft.Graft.pageRank(edges, 3).count() }
      time("q70_full_1st") { graft.ops.Relational.q70PageRank(spark, sfDir).count() }
      time("q70_full_2nd") { graft.ops.Relational.q70PageRank(spark, sfDir).count() }
    }
    spark.stop()
  }
}
