package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (builder prompt: "salting for skew, AQE for runtime
  * re-plan"). AQE's skew-join split handles most shuffle skew
  * automatically (on by default in Spark 4); explicit salting remains
  * the tool when one build-side key dominates a *broadcastless* join or
  * an aggregation — e.g. the empty-text or boilerplate key in a dedup
  * groupBy at 100 TB. */
object Skew {

  /** Salted equi-join: the big (skewed) side gets a deterministic salt
    * in [0, n); the small side is replicated n times so every
    * (key, salt) combination exists. The shuffle then partitions on
    * (key, salt) — a hot key spreads across n reducers instead of
    * melting one. Cost: n-fold replication of the small side; choose n
    * ~ (hot-key rows / target partition rows). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, n: Int): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(n)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until n).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Salted two-phase aggregation: aggregate on (key, salt) first
    * (spreads a hot key over n partial groups), then re-aggregate on
    * key. `merge` must re-combine the partials (sum->sum, count->sum,
    * min->min, …). */
  def saltedAgg(df: DataFrame, key: String, n: Int,
      partial: Map[String, Column => Column], merge: Map[String, Column => Column])
      : DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(n)).cast("int"))
    val phase1 = salted.groupBy(col(key), col("__salt"))
      .agg(partial.head._2(col(partial.head._1)).as(partial.head._1),
        partial.tail.map { case (c, f) => f(col(c)).as(c) }.toSeq: _*)
    phase1.groupBy(col(key))
      .agg(merge.head._2(col(merge.head._1)).as(merge.head._1),
        merge.tail.map { case (c, f) => f(col(c)).as(c) }.toSeq: _*)
  }
}
