package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Storage-layout operators: the two techniques that remove the
  * dominant exchanges from a 100 TB pipeline BEFORE any query runs —
  * bucketed co-located joins and partition-pruned scans. Both are
  * write-side investments: pay one shuffle at ingest, then every
  * downstream join/scan skips it. The harness queries materialize the
  * layout under java.io.tmpdir (the mediaParquet pattern,
  * Multimodal.scala) and then prove the read-side property on the
  * physical plan (PlanAuditSpec): q30's join runs with ZERO shuffle
  * exchange, q31's scan lists only the matching partition directories.
  *
  * Reference surface: the reference pipeline re-reads and re-joins its
  * full extract on every run (no layout reuse exists in pandas —
  * SURVEY §2b "file-format scans"/"equi join" categories); these
  * operators are the engine-completeness items a Spark user relies on
  * at scale.
  */
object Layout {

  /** Dir -> filesystem/catalog-safe suffix. 16 hex chars of MD5, not
    * `String.hashCode`: a 32-bit tag collides two different source
    * dirs at birthday-paradox rates and would silently serve one
    * dir's layout copy for the other (ADVICE round 7); 64 bits of a
    * cryptographic digest makes that astronomically unlikely.
    *
    * The digest covers the dir path PLUS every contained parquet
    * file's (name, mtime, length): a layout copy is derived DATA, so
    * an in-place regeneration of the source (the round-9 testdata
    * event) must miss every `_SUCCESS`/catalog guard and rebuild —
    * a path-only tag would serve the stale copy forever while the
    * oracle reads the new source. */
  private[ops] def tag(dir: String): String = {
    val d = new java.io.File(dir)
    val files = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      .map(f => s"${f.getName}:${f.lastModified}:${f.length}")
    java.security.MessageDigest.getInstance("MD5")
      .digest((dir +: files).mkString("|")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map(b => f"${b & 0xff}%02x").mkString
  }

  private[ops] def tmpPath(kind: String, dir: String): String =
    new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_${kind}_${tag(dir)}").getPath

  /** Bucket count for the co-located join demo. At 100 TB this is the
    * real tuning knob (buckets ≈ cluster cores × small multiple, sized
    * so one bucket's build side fits in executor memory); 8 keeps the
    * harness write cheap while still proving the plan property. */
  private val NumBuckets = 8

  /** Materialize `lineitem` and `orders` as bucketed+sorted tables on
    * their join key via [[graft.Graft.writeBucketed]], once per
    * (session, source dir). Note the downstream join still plans a
    * per-bucket LOCAL sort: Spark ≥3.0 does not propagate the files'
    * sortBy order by default
    * (`spark.sql.legacy.bucketedTableScan.outputOrdering`) because
    * honoring it pins scan granularity to one task per bucket file —
    * splittable scans + node-local sort is the better trade at 100 TB.
    * What bucketing buys, and what PlanAuditSpec asserts, is the
    * absence of any EXCHANGE: the network-dominant cost at scale.
    *
    * Registered through the session catalog (shared across `newSession`
    * clones) because bucket metadata lives in the table definition, not
    * the parquet files; plain `spark.read.parquet` over the same files
    * would see an unbucketed scan and shuffle anyway. Idempotent per
    * JVM via `tableExists` — re-running the query re-plans the join but
    * pays the layout write only once, which is the production shape
    * (ingest writes, a thousand later joins read). */
  private[graft] def bucketedTables(s: SparkSession, dir: String): (String, String) = {
    val lT = s"graft_bkt_lineitem_${tag(dir)}"
    val oT = s"graft_bkt_orders_${tag(dir)}"
    // each table guards itself: a failure between the two writes must
    // not leave a catalog state where the survivor's guard skips the
    // missing table on retry. The guard checks BOTH the catalog entry
    // and the files' _SUCCESS marker (ADVICE round 7): the data lives
    // under java.io.tmpdir, so a tmp-cleaner can delete the files out
    // from under a still-registered table — catalog-only the skip
    // would hand the join a table whose scan fails. A half-written
    // path (no _SUCCESS) is rewritten the same way; saveAsTable with
    // mode=overwrite replaces any stale catalog entry.
    def ready(t: String, path: String): Boolean =
      s.catalog.tableExists(t) && new java.io.File(path, "_SUCCESS").exists()
    if (!ready(lT, tmpPath("bkt_lineitem", dir)))
      graft.Graft.writeBucketed(Tables(s, dir, "lineitem"), NumBuckets,
        "l_orderkey", tmpPath("bkt_lineitem", dir), lT)
    if (!ready(oT, tmpPath("bkt_orders", dir)))
      graft.Graft.writeBucketed(Tables(s, dir, "orders"), NumBuckets,
        "o_orderkey", tmpPath("bkt_orders", dir), oT)
    (lT, oT)
  }

  /** The exchange-free join stage PlanAuditSpec audits: big ⋈ big on
    * the bucket key with no shuffle on either side. The `merge` hint
    * pins the sort-merge strategy the 100 TB plan uses — at harness
    * scale AQE would broadcast the few-MB orders side instead, which
    * is exactly the strategy that stops existing at production scale
    * (unlike a forced broadcast, a forced merge join cannot OOM — it
    * is the conservative strategy, so baking it in is safe). */
  private[graft] def q30JoinStage(s: SparkSession, lT: String, oT: String): DataFrame = {
    import s.implicits._
    s.table(lT).hint("merge")
      .join(s.table(oT), $"l_orderkey" === $"o_orderkey")
      .select($"o_orderpriority", $"l_extendedprice", $"l_discount")
  }

  /** q30 — bucketed co-located join: revenue by order priority over
    * lineitem ⋈ orders, where BOTH sides are bucketed by the join key
    * so the join itself shuffles nothing (the only exchange in the
    * whole query is the 5-group aggregate's). The bench number is
    * dominated by the one-time layout write (bucketedTables); the
    * read-side join is the cheap, exchange-free part — the asymmetry
    * that makes bucketing pay for itself after one reuse at scale. */
  def q30BucketedJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (lT, oT) = bucketedTables(s, dir)
    q30JoinStage(s, lT, oT)
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"))
      .orderBy($"o_orderpriority")
  }

  /** Materialize the events table partitioned by `event_type` (hive
    * directory layout), once per (JVM, source dir) — the `_SUCCESS`
    * guard makes reruns free, same-dir content is deterministic. The
    * `repartition(event_type)` keeps it to one file per partition
    * value instead of (write tasks × values). At 100 TB the partition
    * column is the one every consumer filters on (event type, date,
    * language, source domain — low cardinality, high selectivity). */
  private[graft] def eventsPartitioned(s: SparkSession, dir: String): String = {
    val path = tmpPath("evt_by_type", dir)
    if (!new java.io.File(path, "_SUCCESS").exists())
      graft.Graft.writePartitioned(Tables(s, dir, "events"), "event_type", path)
    path
  }

  /** The pruned scan PlanAuditSpec audits: the `event_type` predicate
    * must appear under PartitionFilters (directory pruning at plan
    * time — non-matching partitions are never listed, let alone read),
    * NOT as a data filter evaluated per row group. */
  private[graft] def q31Scan(s: SparkSession, path: String): DataFrame = {
    import s.implicits._
    s.read.parquet(path)
      .filter($"event_type" === "purchase")
      .groupBy(pmod($"user_id", lit(20)).as("bucket"))
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("sum_value"))
      .orderBy($"bucket")
  }

  /** q31 — partition-pruned scan: per-user-bucket purchase stats off
    * the type-partitioned events copy. The scan touches only the
    * `event_type=purchase` directory — at 100 TB that is the
    * difference between reading one partition's files and the corpus.
    * `value` sums are safe under round(…, 2): events.value is
    * 2-decimal-quantized (the PERF.md third regime). */
  def q31PartitionPruning(s: SparkSession, dir: String): DataFrame =
    q31Scan(s, eventsPartitioned(s, dir))

  /** Materialize lineitem as ORC, once per (JVM, source dir) — the
    * second columnar source format (built-in `orc` datasource; no
    * external jar). Same `_SUCCESS` guard as the other layout writes. */
  private[graft] def lineitemOrc(s: SparkSession, dir: String): String = {
    val path = tmpPath("orc_lineitem", dir)
    if (!new java.io.File(path, "_SUCCESS").exists())
      Tables(s, dir, "lineitem").write.mode("overwrite").orc(path)
    path
  }

  /** The ORC scan PlanAuditSpec audits: the quantity predicate must
    * reach the ORC reader's PushedFilters (ORC carries min/max stride
    * statistics exactly for this) and the read schema must exclude
    * every untouched column — the same pushdown+pruning contract the
    * parquet scans prove, now on the second format. */
  private[graft] def q32Scan(s: SparkSession, path: String): DataFrame = {
    import s.implicits._
    s.read.orc(path)
      .filter($"l_quantity" >= 25)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n_items"),
        round(sum($"l_extendedprice"), 2).as("sum_price"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** q32 — ORC source roundtrip: lineitem written once as ORC, read
    * back through the built-in ORC datasource, and aggregated — the
    * oracle reads the original parquet, so a hash match proves the
    * format conversion is content-exact (the q30/q31 layout-copy
    * contract applied to a second file format). */
  def q32OrcRoundtrip(s: SparkSession, dir: String): DataFrame =
    q32Scan(s, lineitemOrc(s, dir))
}
