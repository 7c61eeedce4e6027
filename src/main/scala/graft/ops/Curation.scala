package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** End-to-end corpus curation (SURVEY.md §2b's LLM-pipeline operators
  * COMPOSED — the shape a real 100 TB training-data run chains them
  * in, cf. C4/Gopher/FineWeb pipeline papers). Each stage is an
  * operator the registry already proves in isolation; this file proves
  * the COMPOSITION: one declarative plan from raw documents to a
  * per-source corpus report, with every intermediate staying
  * distributed.
  *
  * The reference
  * (`/root/reference/Sample-Json-to-SQL-Full-Pipeline-EO-10-03-2019.py`)
  * chains stages eagerly per file (`P:787-816`); here the whole chain
  * is ONE Catalyst plan, so filters push into earlier stages and
  * nothing materializes between them.
  */
object Curation {

  /** c01 — the curation pipeline: language gate -> quality gate
    * (t12's exact rules: token-count bounds + Gopher repetition
    * ratio) -> exact dedup (d01's normalize + keep-first) -> per-source
    * stratified cap (t13's salted-hash order, quota 50) -> per-source
    * corpus report (docs kept, whitespace tokens, doc-id checksum).
    *
    * Scale shape: the lang + quality gates are ONE fused projection
    * over the scan (no shuffle — predicates on derived columns
    * evaluate in the scan stage and the metadata `lang` filter pushes
    * to parquet); dedup shuffles an 8-byte xxhash64 of the normalized
    * text, never the text (d01's discipline); the stratified cap and
    * final report share the `source` partitioning, and everything
    * after dedup carries only (doc_id, source, n_tokens) — the text
    * column is projected away before any exchange. At 100 TB the only
    * wide ops are two narrow-key shuffles (content hash, source) over
    * already-gated rows — each stage SHRINKS the data before the next
    * pays for it, which is the whole point of running curation as one
    * plan instead of materializing between stages.
    *
    * Determinism: every gate is a deterministic expression; dedup
    * keeps the minimum doc_id per content class; the cap orders by
    * md5 of a salted doc id (t13's argument — unique per doc, stable
    * across engines); the report is a count/sum aggregate — no
    * rounding discipline needed (integer sums). */
  def c01Curation(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.spread(Tables(s, dir, "documents"))
    val gated = docs
      .filter($"lang" === "en")
      .filter(TextAnalysis.qualityReason($"text", 10, 1000, 0.2) === "keep")
    val deduped = graft.Graft.dedupExact(gated, "text", "doc_id")
      // past dedup, only the narrow columns travel
      .select($"doc_id", $"source",
        size(TextDedup.tokens($"text")).cast("long").as("n_tokens"))
    val bySalt = Window.partitionBy($"source")
      .orderBy(md5(concat(lit("strat:"), $"doc_id".cast("string"))))
    deduped.withColumn("__rk", row_number().over(bySalt))
      .filter($"__rk" <= 50)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tokens").as("n_tokens"),
        sum($"doc_id").as("sum_doc_id"))
      .orderBy($"source")
  }

  /** c02 — training-set ASSEMBLY, the chain downstream of c01's
    * curation: the same lang/quality/dedup pool, weighted-downsampled
    * to a 128-doc token budget by priority sampling (weight =
    * whitespace token count — long documents preferentially, the t29
    * estimator keeping the accounting honest), then greedily packed
    * into 256-token training sequences over 8 shards (t11's
    * sharded running-sum assignment), reported per (shard, bin) pack:
    * the docs-per-sequence / tokens-per-sequence profile a trainer's
    * data loader is configured from.
    *
    * Scale shape: the gates fuse into the scan and dedup shuffles
    * 8-byte hashes (c01's argument); the sample head is a
    * TakeOrderedAndProject over (id, n_tokens, priority) triples —
    * the TEXT never reaches the sampler, the weight table is the
    * narrow projection dedup already produced; packing windows over
    * the 128-row sample per shard. Every number in the report is an
    * integer — no rounding discipline anywhere in the chain. */
  def c02Assembly(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.spread(Tables(s, dir, "documents"))
    val gated = docs
      .filter($"lang" === "en")
      .filter(TextAnalysis.qualityReason($"text", 10, 1000, 0.2) === "keep")
    val pool = graft.Graft.dedupExact(gated, "text", "doc_id")
      .select($"doc_id",
        size(TextDedup.tokens($"text")).cast("long").as("n_tokens"))
    val sampled = graft.Graft.prioritySample(pool, "doc_id", "n_tokens", 128)
    graft.Graft.packSequences(
        sampled.select($"doc_id", $"n_tokens"), "doc_id", "n_tokens",
        capacity = 256, shards = 8)
      .groupBy($"shard", $"bin")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tokens").as("n_tokens"),
        min($"doc_id").as("min_doc"),
        max($"doc_id").as("max_doc"))
      .orderBy($"shard", $"bin")
  }

  /** Per-table (name, primary-key columns) for the snapshot manifest —
    * lineitem's key is composite; everything else is a single id. */
  private val ManifestKeys: Seq[(String, Seq[String])] = Seq(
    "region" -> Seq("r_regionkey"), "nation" -> Seq("n_nationkey"),
    "customer" -> Seq("c_custkey"), "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"), "orders" -> Seq("o_orderkey"),
    "lineitem" -> Seq("l_orderkey", "l_linenumber"),
    "events" -> Seq("event_id"), "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  /** c03 — snapshot MANIFEST: one row per harness table with row
    * count, column count, and an order-independent key checksum (XOR
    * fold of 48-bit md5 prefixes over the canonical key string) — the
    * artifact a pipeline run records so the NEXT run can prove its
    * inputs are byte-for-byte the same population (diff two manifests
    * → exactly which tables changed and whether rows appeared,
    * vanished, or merely moved). Row-membership, not full-content,
    * checksumming: the fold is layout- and order-independent (XOR
    * commutes), so a repartition or compaction leaves it fixed while
    * any insert/delete flips it.
    *
    * XOR, NOT SUM (the m02 lesson, re-learned here by the sf0.1
    * determinism sweep: summed 2^47-average prefixes overflow a
    * BIGINT past ~65k rows, and ANSI mode rightly throws) — the XOR
    * fold never overflows at any row count. The one semantic trade:
    * a key present an EVEN number of times cancels out, which is
    * harmless here because every manifest key is a primary key
    * (lineitem's is composite) — uniqueness per table is exactly
    * what a manifest also wants to witness.
    *
    * Scale shape: ten independent scan+aggregate plans (each a narrow
    * key projection, partial-aggregated to ONE row before any
    * exchange) unioned as metadata — the manifest costs one pass over
    * the key columns only, never the payloads. */
  def c03Manifest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ManifestKeys.map { case (t, keys) =>
      val df = Tables(s, dir, t)
      val keyStr = concat_ws("_", keys.map(col): _*)
      df.select(conv(substring(md5(keyStr.cast("binary")), 1, 12), 16, 10)
          .cast("long").as("__k"))
        .agg(count(lit(1)).as("n_rows"),
          expr("bit_xor(__k)").as("key_xor"))
        .select(lit(t).as("table_name"),
          lit(df.columns.length.toLong).as("n_cols"),
          $"n_rows", $"key_xor")
    }.reduce(_ unionByName _).orderBy($"table_name")
  }

  /** c05 — expectation checks (the dbt-test/Deequ constraint layer a
    * pipeline gates a new drop on BEFORE trusting it): five
    * production-shaped rules — primary-key uniqueness, foreign-key
    * integrity, two value-range expectations, and a cross-column
    * consistency invariant — each reported as (rule, n_checked,
    * n_violations). Passing rules report zero violations (pk, fk,
    * n_chars here); the range rules genuinely fire on this data
    * (non-degenerate at sf0.001/0.01/0.1 — probed 124/1175/11992 and
    * 11/122/1332), so the violation-counting path is exercised, not
    * dead code.
    *
    * Scale shape: every range/consistency rule is a conditional count
    * inside one partial-aggregated scan of its table (one row crosses
    * the exchange); uniqueness is count - countDistinct on the key
    * column only; FK integrity is a LEFT ANTI join on the two key
    * columns, un-hinted (the dimension may or may not broadcast —
    * AQE's call). No payload column is ever read — at 100 TB the
    * whole suite costs key-column scans. All-integer output. */
  def c05Expectations(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables(s, dir, "orders")
    val nOrders = orders.agg(count(lit(1)).as("n"),
      countDistinct($"o_orderkey").as("nd"))
    val pk = nOrders.select(lit("orders_pk_unique").as("rule"),
      $"n".as("n_checked"), ($"n" - $"nd").as("n_violations"))
    val fkViol = orders.join(
        Tables(s, dir, "customer").select($"c_custkey".as("o_custkey")),
        Seq("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("v"))
    val fk = nOrders.crossJoin(fkViol)
      .select(lit("orders_fk_customer").as("rule"),
        $"n".as("n_checked"), $"v".as("n_violations"))
    val qty = Tables(s, dir, "lineitem")
      .agg(count(lit(1)).as("n_checked"),
        count(when($"l_quantity" > 49, 1)).as("n_violations"))
      .select(lit("lineitem_qty_le_49").as("rule"),
        $"n_checked", $"n_violations")
    val bal = Tables(s, dir, "customer")
      .agg(count(lit(1)).as("n_checked"),
        count(when($"c_acctbal" < 0, 1)).as("n_violations"))
      .select(lit("customer_bal_nonneg").as("rule"),
        $"n_checked", $"n_violations")
    val chars = Tables(s, dir, "documents")
      .agg(count(lit(1)).as("n_checked"),
        count(when($"n_chars" =!= length($"text"), 1)).as("n_violations"))
      .select(lit("documents_nchars_consistent").as("rule"),
        $"n_checked", $"n_violations")
    Seq(pk, fk, qty, bal, chars).reduce(_ unionByName _)
      .orderBy($"rule")
  }

  /** c06 — the FULL referential-integrity graph of the warehouse
    * ([[graft.Graft.fkAudit]] per edge): every declared child->parent
    * relationship audited in BOTH directions — orphan child rows
    * (violations) and unreferenced parent rows (the truncated-load
    * tripwire). c05 checks one FK as part of its expectation suite;
    * this is the schema-wide audit a warehouse runs nightly.
    *
    * Scale shape: seven independent audits, each the fkAudit shape
    * (one scan per side folding to per-key counts, one full-outer
    * key join — r20); the per-edge one-row digests union into the
    * report. */
  def c06RefIntegrity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def t(n: String) = Tables(s, dir, n)
    val edges = Seq(
      ("orders.custkey->customer", t("orders"), "o_custkey",
        t("customer"), "c_custkey"),
      ("lineitem.orderkey->orders", t("lineitem"), "l_orderkey",
        t("orders"), "o_orderkey"),
      ("lineitem.partkey->part", t("lineitem"), "l_partkey",
        t("part"), "p_partkey"),
      ("lineitem.suppkey->supplier", t("lineitem"), "l_suppkey",
        t("supplier"), "s_suppkey"),
      ("customer.nationkey->nation", t("customer"), "c_nationkey",
        t("nation"), "n_nationkey"),
      ("supplier.nationkey->nation", t("supplier"), "s_nationkey",
        t("nation"), "n_nationkey"),
      ("nation.regionkey->region", t("nation"), "n_regionkey",
        t("region"), "r_regionkey"))
    edges.map { case (name, c, ck, p, pk2) =>
      graft.Graft.fkAudit(c, ck, p, pk2, name)
    }.reduce(_ unionByName _).orderBy($"relation")
  }

  /** c07 — ingest-volume anomaly audit: flag days whose event count
    * sits more than 2 population standard deviations from the daily
    * mean — the partition-level freshness/completeness tripwire a
    * warehouse runs after every load (a half-loaded day or a
    * double-loaded day shows up here before any query reads it).
    *
    * The 2-sigma test is INTEGER-EXACT — no mean, no sqrt, no float:
    * |cnt - sum/n| > 2*sigma  <=>  (n*cnt - sum)^2 > 4*(n*sumsq -
    * sum^2), every term a product of integer counts. Products are
    * computed in DECIMAL(38,0) (mirrored as HUGEINT in the oracle) so
    * the squares cannot overflow at any scale — day counts of 10^12
    * square to 10^24, past BIGINT. The one-row (n, sum, sumsq) digest
    * broadcasts back onto the 31-row daily frame.
    *
    * Scale shape: one partial-folded day-keyed aggregate over the
    * scan (at 100 TB the day count usually comes free from partition
    * metadata — q40's pushdown shape would answer it from footers);
    * everything after operates on rows-per-day, not rows. */
  def c07AnomalyDays(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Tables(s, dir, "events")
      .groupBy(to_date($"ts").as("day"))
      .agg(count(lit(1)).as("cnt"))
    val dec = "decimal(38,0)"
    val stats = daily.agg(
      count(lit(1)).cast(dec).as("n"),
      sum($"cnt").cast(dec).as("s"),
      sum($"cnt".cast(dec) * $"cnt".cast(dec)).as("sq"))
    daily.crossJoin(broadcast(stats))
      .select($"day", $"cnt",
        (($"n" * $"cnt".cast(dec) - $"s") * ($"n" * $"cnt".cast(dec) - $"s") >
          lit(4) * ($"n" * $"sq" - $"s" * $"s")).as("is_anomaly"))
      .orderBy($"day")
  }

  /** c08 — snapshot reconciliation ([[graft.Graft.snapshotDiff]]):
    * the row-level diff between two drops of the orders table — which
    * primary keys were added, removed, changed, or untouched — the
    * audit a warehouse runs before promoting a reload (and the shape
    * of CDC validation). The harness constructs both snapshots
    * deterministically from the one orders table: snapshot A drops
    * keys ≡3 (mod 7), snapshot B drops keys ≡2 (mod 5) and bumps the
    * price of keys ≡0 (mod 11) by exactly one dollar — so all four
    * statuses occur and the expected classification is pure key
    * arithmetic the oracle mirrors. Prices compare as integer CENTS
    * (round(x*100), the q71 discipline) so "changed" can never be a
    * float-noise artifact.
    *
    * The digest (status, count, key-sum) is integer-exact; any
    * misclassified key moves a sum and hash-fails. Scale shape: one
    * full-outer pk hash join + a 4-group digest — see the facade
    * scaladoc. */
  /** c09 — right-to-be-forgotten purge CASCADE audit: given a
    * tombstone set of customer keys, size the deletion's blast radius
    * across the FK graph before executing it — the per-table purged
    * row counts + key checksums (customer → their orders → those
    * orders' lineitems, each a semi-join reachability hop), plus the
    * post-purge leak check (surviving orders that still reference a
    * tombstoned customer — structurally zero, and the audit proves
    * it). This is the read-side half of GDPR deletion at scale: the
    * cascade is pure semi/anti joins keyed on the FK edges, no
    * wide-row shuffles, and the digests partial-fold — the same plan
    * at 100 TB sizes a purge without touching a byte of payload. */
  def c09PurgeAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tomb = Tables(s, dir, "customer")
      .filter($"c_custkey" % 97 === 0).select($"c_custkey".as("k"))
    val orders = Tables(s, dir, "orders")
    val li = Tables(s, dir, "lineitem")
    val deadOrders = orders
      .join(tomb, orders("o_custkey") === tomb("k"), "left_semi")
    val deadLi = li.join(deadOrders.select($"o_orderkey"),
      li("l_orderkey") === $"o_orderkey", "left_semi")
    def digest(df: DataFrame, keyCol: Column, tbl: String): DataFrame =
      df.agg(count(lit(1)).as("n_purged"),
          coalesce(sum(keyCol), lit(0L)).as("key_sum"))
        .select(lit(tbl).as("tbl"), $"n_purged", $"key_sum")
    val leaks = orders
      .join(deadOrders.select($"o_orderkey".as("__dk")),
        orders("o_orderkey") === $"__dk", "left_anti")
      .join(tomb, orders("o_custkey") === tomb("k"), "left_semi")
      .agg(count(lit(1)).as("n_purged"))
      .select(lit("surviving_fk_leaks").as("tbl"), $"n_purged",
        lit(0L).as("key_sum"))
    digest(tomb, $"k", "customer")
      .unionAll(digest(deadLi, $"l_orderkey", "lineitem"))
      .unionAll(digest(deadOrders, $"o_orderkey", "orders"))
      .unionAll(leaks)
      .orderBy($"tbl")
  }

  def c08SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_orderpriority",
        round($"o_totalprice" * 100).cast("long").as("cents"))
    val snapA = o.filter($"o_orderkey" % 7 =!= 3)
    val snapB = o.filter($"o_orderkey" % 5 =!= 2)
      .withColumn("cents", $"cents" +
        when($"o_orderkey" % 11 === 0, 100L).otherwise(0L))
    graft.Graft.snapshotDiff(snapA, snapB, "o_orderkey")
      .groupBy($"status")
      .agg(count(lit(1)).as("n_keys"), sum($"o_orderkey").as("key_sum"))
      .orderBy($"status")
  }
}
