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

  /** Typed aggregate specs for [[saltedAgg]]: each spec derives BOTH its
    * partial (per key+salt) and merge (per key) expressions, so the two
    * phases cannot be mismatched — the failure mode of the earlier API,
    * which made callers hand-spell matching partial/merge pairs. A
    * nonexistent column fails at plan time with Spark's
    * unresolved-column AnalysisException. */
  sealed abstract class SaltedSpec {
    private[ops] def partials: Seq[Column]
    private[ops] def merges: Seq[Column]
    private[ops] def output: Column
  }
  /** sum(column) AS as */
  final case class SaltedSum(column: String, as: String) extends SaltedSpec {
    private[ops] def partials = Seq(sum(col(column)).as(as))
    private[ops] def merges = Seq(sum(col(as)).as(as))
    private[ops] def output = col(as)
  }
  /** count(*) AS as */
  final case class SaltedCount(as: String) extends SaltedSpec {
    private[ops] def partials = Seq(count(lit(1)).as(as))
    private[ops] def merges = Seq(sum(col(as)).as(as))
    private[ops] def output = col(as)
  }
  /** min(column) AS as */
  final case class SaltedMin(column: String, as: String) extends SaltedSpec {
    private[ops] def partials = Seq(min(col(column)).as(as))
    private[ops] def merges = Seq(min(col(as)).as(as))
    private[ops] def output = col(as)
  }
  /** max(column) AS as */
  final case class SaltedMax(column: String, as: String) extends SaltedSpec {
    private[ops] def partials = Seq(max(col(column)).as(as))
    private[ops] def merges = Seq(max(col(as)).as(as))
    private[ops] def output = col(as)
  }
  /** avg(column) AS as — decomposes to (sum, count) partials so the
    * merge is exact (an avg-of-avgs would weight salt groups wrongly). */
  final case class SaltedAvg(column: String, as: String) extends SaltedSpec {
    private def s = s"__sum_$as"; private def c = s"__cnt_$as"
    private[ops] def partials =
      Seq(sum(col(column)).as(s), count(col(column)).as(c))
    private[ops] def merges = Seq(sum(col(s)).as(s), sum(col(c)).as(c))
    private[ops] def output = (col(s) / col(c)).as(as)
  }

  /** Salted two-phase aggregation: aggregate on (key, salt) first
    * (spreads a hot key over n partial groups), then re-aggregate on
    * key. Output columns: key, then one column per spec in order. */
  def saltedAgg(df: DataFrame, key: String, n: Int,
      specs: Seq[SaltedSpec]): DataFrame = {
    require(specs.nonEmpty, "saltedAgg needs at least one aggregate spec")
    val salted = df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(n)).cast("int"))
    val p = specs.flatMap(_.partials)
    val phase1 = salted.groupBy(col(key), col("__salt")).agg(p.head, p.tail: _*)
    val m = specs.flatMap(_.merges)
    phase1.groupBy(col(key)).agg(m.head, m.tail: _*)
      .select(col(key) +: specs.map(_.output): _*)
  }
}
