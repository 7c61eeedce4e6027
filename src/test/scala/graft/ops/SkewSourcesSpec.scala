package graft.ops

import java.nio.file.Files
import graft.SparkSuiteBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Skew-salting equivalence + the remaining source formats from
  * SURVEY.md §2b row 1 (csv; json corrupt-record tolerance). */
class SkewSourcesSpec extends SparkSuiteBase {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("salted join returns exactly the rows of the plain join, shuffled on (key, salt)") {
    val li = graft.Tables(spark, sf, "lineitem")
    val supp = graft.Tables(spark, sf, "supplier")
    val plain = li.join(supp, $"l_suppkey" === $"s_suppkey")
    val salted = Skew.saltedJoin(
      li.withColumnRenamed("l_suppkey", "k"),
      supp.withColumnRenamed("s_suppkey", "k"), "k", n = 4)
    assert(salted.count() == plain.count())
    val revPlain = plain.agg(round(sum($"l_extendedprice"), 2)).head().getDouble(0)
    val revSalted = salted.agg(round(sum($"l_extendedprice"), 2)).head().getDouble(0)
    assert(revPlain == revSalted)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try { // suppress broadcast so the salt actually reaches an exchange
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = Skew.saltedJoin(
        li.withColumnRenamed("l_suppkey", "k"),
        supp.withColumnRenamed("s_suppkey", "k"), "k", 4)
        .queryExecution.executedPlan.toString
      assert(plan.contains("__salt"), s"salt missing from plan:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted two-phase aggregation equals direct aggregation") {
    val li = graft.Tables(spark, sf, "lineitem")
    val direct = li.groupBy($"l_returnflag")
      .agg(round(sum($"l_quantity"), 2).as("q"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().toSet
    val salted = Skew.saltedAgg(li, "l_returnflag", 8, Seq(
        Skew.SaltedSum("l_quantity", "q"), Skew.SaltedCount("n")))
      .select($"l_returnflag", round($"q", 2), $"n")
      .as[(String, Double, Long)].collect().toSet
    assert(salted == direct)
  }

  test("salted avg merges exactly and misuse fails at plan time") {
    val li = graft.Tables(spark, sf, "lineitem")
    val direct = li.groupBy($"l_returnflag")
      .agg(round(avg($"l_quantity"), 6).as("a"))
      .as[(String, Double)].collect().toSet
    val salted = Skew.saltedAgg(li, "l_returnflag", 8, Seq(
        Skew.SaltedAvg("l_quantity", "a"),
        Skew.SaltedMin("l_quantity", "mn"), Skew.SaltedMax("l_quantity", "mx")))
      .select($"l_returnflag", round($"a", 6))
      .as[(String, Double)].collect().toSet
    assert(salted == direct)
    // a typo'd column is an analysis-time error, not silent wrong data
    intercept[org.apache.spark.sql.AnalysisException] {
      Skew.saltedAgg(li, "l_returnflag", 8, Seq(
        Skew.SaltedSum("no_such_column", "x"))).queryExecution.analyzed
    }
  }

  test("hybrid skew join equals the plain join and splits hot-broadcast / cold-shuffle") {
    val ev = graft.Tables(spark, sf, "events")
      .select(when($"user_id" % 10 =!= 0, lit(1L))
        .otherwise($"user_id").as("k"), $"event_id")
    val dim = graft.Tables(spark, sf, "customer")
      .select($"c_custkey".as("k"), $"c_mktsegment")
    val plain = ev.join(dim, Seq("k"))
      .agg(count(lit(1)), sum($"event_id")).head()
    // exact pre-pass (sampleOneIn=1): the hot key always detected
    val hybrid = Skew.hybridSkewJoin(ev, dim, "k", topK = 4,
      minCount = 100L)
    assert(hybrid.agg(count(lit(1)), sum($"event_id")).head() == plain)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try { // suppress auto-broadcast so the split is structural, not AQE's
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = Skew.hybridSkewJoin(ev, dim, "k", topK = 4,
        minCount = 100L).queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"hot path lost its broadcast:\n${plan.take(3000)}")
      assert(plan.contains("Union"), s"no union of halves:\n${plan.take(3000)}")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"cold path lost its shuffle join:\n${plan.take(3000)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // threshold never met -> pure fallback to the plain join
    val fallback = Skew.hybridSkewJoin(ev, dim, "k", topK = 4,
      minCount = Long.MaxValue)
    assert(fallback.agg(count(lit(1)), sum($"event_id")).head() == plain)
    // sampled pre-pass stays answer-invariant regardless of hot-set hits
    val sampled = Skew.hybridSkewJoin(ev, dim, "k", topK = 4,
      minCount = 8L, sampleOneIn = 16)
    assert(sampled.agg(count(lit(1)), sum($"event_id")).head() == plain)
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    // The builder-prompt skew strategy is two-layer: AQE's runtime
    // skew-join split handles shuffle skew automatically; explicit
    // salting (the tests above) is for the cases AQE can't touch
    // (aggregations, broadcastless hot build sides). This proves the
    // FIRST layer actually fires: a cloned session with the skew
    // thresholds scaled down to test volume (the same knobs, same
    // mechanism, as a production tune — defaults are sized for
    // 256 MB partitions), a join with one dominant key, and the
    // final adaptive plan must mark the join skew=true.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    import s2.implicits._
    // pad is id-derived (NOT a literal — constant folding would hoist
    // a literal above the exchange and the hot partition would carry
    // only 8-byte keys, never crossing the skew threshold)
    val big = s2.range(40000)
      .select(when($"id" % 4 =!= 0, 0L).otherwise($"id").as("k"),
        concat(lit("x" * 64), $"id".cast("string")).as("pad")) // ~75% on key 0
    val small = s2.range(200).select($"id".as("k"), lit(1).as("v"))
    val joined = big.join(small, "k")
    joined.collect() // materialize THIS queryExecution so AQE finalizes it
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), s"AQE did not finalize:\n$plan")
    assert(plan.contains("skew=true"),
      s"expected a skew-split join in the final plan:\n$plan")
  }

  test("csv source round-trips with explicit schema and header") {
    val dir = Files.createTempDirectory("graft-csv").toString
    val orig = graft.Tables(spark, sf, "region")
    orig.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read
      .schema(StructType(Seq(
        StructField("r_regionkey", IntegerType), StructField("r_name", StringType))))
      .option("header", "true").csv(dir)
    assert(back.as[(Int, String)].collect().toSet ==
      orig.as[(Int, String)].collect().toSet)
  }

  test("orc source round-trips with predicate pushdown on read") {
    val dir = Files.createTempDirectory("graft-orc").toString
    val orig = graft.Tables(spark, sf, "nation")
    orig.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir).filter($"n_regionkey" === 1)
    // same rows as parquet-side filter
    assert(back.select($"n_nationkey").as[Long].collect().toSet ==
      orig.filter($"n_regionkey" === 1).select($"n_nationkey").as[Long].collect().toSet)
    // the filter reaches the ORC scan, not a post-scan Filter only
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("n_regionkey"),
      s"expected pushed filter on the ORC scan:\n$plan")
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = Files.createTempDirectory("graft-part").toString
    graft.Tables(spark, sf, "nation")
      .write.mode("overwrite").partitionBy("n_regionkey").parquet(dir)
    val pruned = spark.read.parquet(dir).filter($"n_regionkey" === 2)
    val plan = pruned.queryExecution.executedPlan.toString
    // partition filter prunes directories at planning — the scan's
    // PartitionFilters carries it and row results match
    assert(plan.contains("PartitionFilters") && plan.contains("n_regionkey"),
      s"expected partition filter on the scan:\n$plan")
    assert(pruned.count() ==
      graft.Tables(spark, sf, "nation").filter($"n_regionkey" === 2).count())
  }

  test("json PERMISSIVE mode captures corrupt records instead of failing (P17 analogue)") {
    val dir = Files.createTempDirectory("graft-badjson")
    Files.writeString(dir.resolve("good.json"), """{"a": 1, "b": "x"}""")
    Files.writeString(dir.resolve("bad.json"), """{"a": broken""")
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType),
      StructField("_corrupt_record", StringType)))
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir.toString)
    val rows = df.collect()
    assert(rows.length == 2)
    assert(rows.count(_.getAs[String]("_corrupt_record") != null) == 1)
    assert(rows.exists(r => r.getAs[Any]("a") == 1L && r.getAs[String]("b") == "x"))
  }
}
