package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Hybrid hot/cold equi-join — the third skew tool beside
    * [[saltedJoin]] (known skew, two-phase shape) and q61's AQE split
    * (runtime skew, sort-merge shape): the big side's HEAVIEST keys
    * take a broadcast path (only the dim rows matching those keys are
    * broadcast — a bounded slice of a dim that is itself too big to
    * broadcast whole), everything else takes the ordinary shuffle
    * path, and the two disjoint halves union. The answer is
    * key-partition-invariant: hot ∪ cold covers every key exactly
    * once, so WHICH keys land in the hot set cannot change the result
    * — only the plan. That invariance is what makes the heavy-key
    * detection safely approximate: with `sampleOneIn` > 1 the
    * frequency pre-pass reads a deterministic 1-in-n row slice
    * (xxhash64 of the row id — no RNG, no extra shuffle; `minCount`
    *
    * Two operational caveats (ADVICE r16), both cost-side only — the
    * hot ∪ cold invariance above means neither can change an answer:
    *   - the heavy-key pre-pass is an EAGER Spark job that runs at
    *     DataFrame-CONSTRUCTION time (the hot set must exist before
    *     the plan can be built), unlike every lazy operator around it;
    *   - with `sampleOneIn` > 1 the slice keys on
    *     `monotonically_increasing_id()`, which depends on the
    *     physical partition layout of `big` — two runs over
    *     differently-partitioned but row-identical inputs can detect
    *     different hot sets and therefore build different PLANS
    *     (same result). Callers needing a layout-stable plan should
    *     sample on a hash of stable row content or pass
    *     `sampleOneIn = 1` (exact counts, layout-free).
    * then applies to SAMPLED counts), so at 100 TB the pre-pass is a
    * cheap partial-folded count over ~1/n of the fact, not a second
    * full scan. Driver state is the heavy-key list itself, bounded by
    * `topK` (never data-sized).
    *
    * Null keys drop on both paths exactly as the plain inner join
    * drops them (`isin`'s null propagates to a filtered-out NULL
    * predicate), so the hybrid is a pure plan rewrite of
    * `big.join(dim, Seq(key))`. */
  def hybridSkewJoin(big: DataFrame, dim: DataFrame, key: String,
      topK: Int = 64, minCount: Long = 1000L,
      sampleOneIn: Int = 1): DataFrame = {
    require(topK >= 1 && topK <= 1024, s"topK out of range: $topK")
    require(sampleOneIn >= 1, s"sampleOneIn out of range: $sampleOneIn")
    val probe =
      if (sampleOneIn == 1) big
      else big.filter(pmod(xxhash64(monotonically_increasing_id()),
        lit(sampleOneIn)) === 0)
    val heavyKeys = probe.groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minCount && col(key).isNotNull)
      .orderBy(col("__n").desc, col(key))
      .limit(topK)
      .select(col(key))
      .collect().map(_.get(0))
    if (heavyKeys.isEmpty) big.join(dim, Seq(key))
    else {
      val hot = big.filter(col(key).isin(heavyKeys: _*))
        .join(broadcast(dim.filter(col(key).isin(heavyKeys: _*))), Seq(key))
      val cold = big.filter(!col(key).isin(heavyKeys: _*))
        .join(dim, Seq(key))
      hot.unionByName(cold)
    }
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

  /** Session for q61: AQE skew-join enabled with thresholds scaled to
    * harness data volume — the DEFAULTS (256 MB) are sized for
    * production shuffles, so proving the mechanism at sf0.01 means
    * telling AQE what "skewed" means at this scale, exactly as a
    * 100 TB deployment tunes the same knobs to its partition sizes.
    * Broadcast is disabled so the join is the sort-merge shape skew
    * splitting applies to. */
  private[graft] def q61Session(s: SparkSession): SparkSession = {
    val s2 = s.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s2.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32768")
    s2.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    s2
  }

  private[graft] def q61Join(s2: SparkSession, dir: String): DataFrame = {
    import s2.implicits._
    // 9-in-10 event rows collapse onto key 0: one shuffle partition
    // carries ~90% of the left side — the hot-key shape. The
    // repartition(8) stands in for the multi-task upstream every
    // production shuffle has: AQE splits a skewed REDUCE partition
    // along its MAP-output blocks (ShufflePartitionsUtil
    // .createSkewPartitionSpecs), and the harness table is ONE
    // parquet row group = one map task = one indivisible block —
    // without upstream parallelism the split is structurally
    // impossible, a sandbox artifact, not an engine property.
    val ev = graft.Tables(s2, dir, "events")
      .select(when($"user_id" % 10 =!= 0, lit(0L))
        .otherwise($"user_id").as("k"), $"value")
      .repartition(8)
    // two structural conditions let OptimizeSkewedJoin actually fire,
    // both the common production shape: (1) the dim side is a PLAIN
    // scan→shuffle (an aggregate between the shuffle read and the
    // join breaks the rule's SortExec-over-shuffle pattern — a
    // derived `distinct()` dim silently disables the split); (2) the
    // downstream aggregate groups on a NON-join-key attribute, so the
    // join's output partitioning is re-shuffled anyway and splitting
    // it costs no extra exchange (AQE declines otherwise unless
    // forceOptimizeSkewedJoin)
    val dim = graft.Tables(s2, dir, "customer")
      .select($"c_custkey".as("k"), pmod($"c_custkey", lit(3)).as("grp"))
    ev.join(dim, Seq("k"), "left")
      .groupBy(coalesce($"grp", lit(-1L)).as("grp"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum($"value"), 2).as("sum_value"))
      .orderBy($"grp")
  }

  /** q61 — AQE RUNTIME skew-join split, the runtime counterpart of
    * q26's compile-time salting (the builder prompt's "salting for
    * skew, AQE for runtime re-plan" pair, now both oracle-gated): a
    * join whose left side piles ~90% of its rows onto one key runs
    * under adaptive execution with skew splitting enabled, and AQE
    * rewrites the sort-merge join at runtime — the oversized
    * partition is split into advisory-sized reads, each matched
    * against a DUPLICATED copy of the right side's partition (the
    * `skew=true` marker on the SMJ node, plan-asserted in
    * PlanAuditSpec after execution since only the FINAL adaptive plan
    * carries it). The oracle recomputes the aggregate directly: the
    * split must be a pure execution rewrite, invisible in the answer.
    *
    * At 100 TB this is the first line of defense for unpredictable
    * hot keys (salting remains the tool when skew is KNOWN and the
    * two-phase shape is wanted); the session only rescales the
    * skew thresholds to harness volume. */
  def q61AqeSkew(s: SparkSession, dir: String): DataFrame =
    q61Join(q61Session(s), dir)

  /** q114 — hybrid hot/cold skew join: the q61 hot-key shape (9-in-10
    * event rows collapse onto customer key 1) joined to the customer
    * dim through [[hybridSkewJoin]] with a 1-in-16 sampled frequency
    * pre-pass — the hot key's rows broadcast-join against just its
    * own dim row while the long tail shuffle-joins, and the union
    * reproduces the plain inner join bit-for-bit (the oracle IS the
    * plain join: the hybrid must be answer-invariant). cents are
    * exact (events.value is 2-dp-quantized positive, the q71
    * rounding argument). At 100 TB this is the shape for a fact whose
    * dim is too big to broadcast whole but whose hot keys are few:
    * salting (q26) replicates the dim n-fold; AQE (q61) needs the
    * skew to survive into one reduce partition; the hybrid pays one
    * sampled pre-pass and removes the hot key from the shuffle
    * entirely. */
  def q114HybridJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = graft.Tables(s, dir, "events")
      .select(when($"user_id" % 10 =!= 0, lit(1L))
        .otherwise($"user_id").as("k"),
        round($"value" * 100).cast("long").as("cents"))
    val dim = graft.Tables(s, dir, "customer")
      .select($"c_custkey".as("k"), $"c_mktsegment")
    hybridSkewJoin(ev, dim, "k", topK = 8, minCount = 32L,
      sampleOneIn = 16)
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_rows"), sum($"cents").as("sum_cents"))
      .orderBy($"c_mktsegment")
  }
}
