package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Semi-structured flattening operators — the reference's actual surface
  * (SURVEY.md §2a, P1–P17 in
  * `/root/reference/Sample-Json-to-SQL-Full-Pipeline-EO-10-03-2019.py`).
  *
  * The harness tables are flat parquet, so each query first *builds* the
  * nested shape (struct / array-of-structs / map) inside the plan, then
  * flattens it back with the operator under test and checks against the
  * flat ground truth via the DuckDB oracle. The reference needs 20-line
  * Python loops per motif (e.g. P:107-126 nested explode); here each is
  * one declarative plan, fully codegen'd, no driver-side iteration.
  *
  * The reusable pipeline equivalents over *real* nested JSON documents
  * (bankpipe/creditpipe/jsonpipe/recpipe) live in
  * [[graft.pipelines.RefPipelines]]; these queries prove the operator
  * semantics against an oracle.
  */
object Flatten {

  /** f01 — record→row pivot + struct splat (P1 `pd.DataFrame(series).T`,
    * P15 scalar-dict→1-row table). Packs each customer row into a struct
    * then splats it back with `select("s.*")` — the Spark spelling of the
    * reference's transpose. Narrow op: zero shuffles (sort is the only
    * exchange, for oracle determinism). */
  def f01StructSplat(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "customer")
      .select(struct($"c_custkey", $"c_name", $"c_acctbal", $"c_mktsegment").as("doc"))
      .select($"doc.*")
      .orderBy($"c_custkey")
  }

  /** f02 — array flatten round-trip (P5 explode, P16 append-accumulate).
    * collect_list per order -> sorted array -> explode back to rows.
    * The oracle is the identity projection of lineitem: proves explode
    * loses/invents nothing. At scale collect_list bounds memory by group
    * cardinality — fine for order-sized groups (<= 7 rows each). */
  def f02ExplodeRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .groupBy($"l_orderkey")
      .agg(array_sort(collect_list($"l_linenumber")).as("lines"))
      .select($"l_orderkey".as("orderkey"), explode($"lines").as("linenumber"))
      .orderBy($"orderkey", $"linenumber")
  }

  /** f03 — nested explode with parent-key stamping (P6: per-account
    * transactions loop, P:107-126/P:485-501). Parent keys (orderkey,
    * priority) ride along the explode in one plan — the reference's
    * 20-line accumulate loop disappears. explode_outer keeps parents
    * whose array is empty (the reference's "omitted table" tolerance);
    * none exist here but the semantics are the point. */
  def f03ExplodeNestedParent(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nested = Tables(s, dir, "lineitem")
      .groupBy($"l_orderkey")
      .agg(array_sort(collect_list(
        struct($"l_linenumber".as("linenumber"), $"l_quantity".as("quantity")))).as("items"))
      .join(Tables(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
    nested
      .select($"o_orderkey".as("orderkey"), $"o_orderpriority".as("priority"),
        explode_outer($"items").as("item"))
      .select($"orderkey", $"priority", $"item.linenumber".as("linenumber"),
        $"item.quantity".as("quantity"))
      .orderBy($"orderkey", $"linenumber", $"quantity")
  }

  /** f04 — map (open-keyed dict) extraction with whitelisted keys +
    * null fallback (P7 statistics map, P12 np.nan default). Unknown keys
    * are simply not selected — the reference's "placeholder for future
    * values" else-branch costs nothing declaratively. */
  def f04MapExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .select($"l_orderkey".as("orderkey"), $"l_linenumber".as("linenumber"),
        map(lit("qty"), $"l_quantity", lit("price"), $"l_extendedprice").as("stats"))
      .select($"orderkey", $"linenumber",
        element_at($"stats", "qty").as("qty"),
        coalesce(element_at($"stats", "mean_closing_balance_30"), lit(0.0)).as("missing_stat"))
      .orderBy($"orderkey", $"linenumber", $"qty")
  }

  /** f05 — account masking (P8: `"XXXX" + account[3:]`, P:94/P:115).
    * Implements the *intent* (char slice); the reference's vectorized
    * form at P:94 is a latent pandas row-slice bug we do not replicate
    * (SURVEY.md §2a). */
  def f05MaskId(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "customer")
      .select($"c_custkey",
        concat(lit("XXXX"), expr("substring(c_name, 4)")).as("mask_id"))
      .orderBy($"c_custkey")
  }

  /** f06 — filename/source-derived key (P9: `str(json_file)[:-17]`).
    * Both motifs: anchored-regex suffix strip and fixed-length slice. */
  def f06SourceKey(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select($"doc_id",
        regexp_replace($"source", "[0-9]+$", "").as("source_kind"),
        substring($"source", 1, 3).as("source_prefix"))
      .orderBy($"doc_id")
  }

  /** f07 — date/time reassembly by string slicing (P10, P:162:
    * `Date`=yyyyMMdd + `Time`=HHmmss -> one timestamp string). The
    * reference emits a nonstandard `HH:mm.ss`; we normalize to `HH:mm:ss`
    * (documented choice, SURVEY.md P10). */
  def f07DateReassembly(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "events")
      .select($"event_id",
        date_format($"ts", "yyyyMMdd").as("d"),
        date_format($"ts", "HHmmss").as("t"))
      .select($"event_id",
        concat(
          substring($"d", 1, 4), lit("-"), substring($"d", 5, 2), lit("-"),
          substring($"d", 7, 2), lit(" "),
          substring($"t", 1, 2), lit(":"), substring($"t", 3, 2), lit(":"),
          substring($"t", 5, 2)).as("report_dt"))
      .orderBy($"event_id")
  }

  /** f08 — array stringification (P11: `flags.astype(str)`). The
    * reference relies on Python's list repr; we use a deterministic
    * delimiter join (SURVEY.md P11 recommends against repr formats). */
  def f08StringifyArray(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .groupBy($"l_orderkey".as("orderkey"))
      .agg(array_join(array_sort(collect_list($"l_linenumber")), ",").as("line_list"))
      .orderBy($"orderkey")
  }

  /** f09 — multi-level null fallback chain (P12: name coalesce
    * P:378-387, `"Not found"` P:399-402, `"Not specified"`). */
  def f09CoalesceChain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "customer")
      .select($"c_custkey",
        coalesce(
          when($"c_acctbal" >= 0, $"c_name"),
          concat_ws(" ", lit("Customer"), $"c_custkey"),
          lit("Not specified")).as("display_name"))
      .orderBy($"c_custkey")
  }

  /** f10 — string building battery (P13 concat names + common scalar
    * string fns the engine exposes). */
  def f10StringBattery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "part")
      .select($"p_partkey",
        concat_ws(" ", $"p_brand", $"p_name").as("full_name"),
        upper($"p_type").as("type_upper"),
        lower($"p_brand").as("brand_lower"),
        trim(lit("  padded  ")).as("trimmed"),
        lpad($"p_partkey".cast("string"), 8, "0").as("key_padded"),
        length($"p_name").cast("long").as("name_len"))
      .orderBy($"p_partkey")
  }
}
