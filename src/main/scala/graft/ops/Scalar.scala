package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scalar function battery (SURVEY.md §2b "scalar fn library"): JSON,
  * regex, date/math, pivot/unpivot. Everything is
  * `org.apache.spark.sql.functions` built-ins — codegen'd, no UDFs
  * (SURVEY.md §4: custom Catalyst work unnecessary for these).
  */
object Scalar {

  /** f11 — JSON field extraction, both engine paths: string-path
    * `get_json_object` and typed `from_json` -> map -> element_at
    * (events.props is a JSON string column). Both stay inside
    * whole-stage codegen; at 100 TB prefer from_json once + multiple
    * field reads over repeated get_json_object parses. */
  def f11JsonExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "events")
      .select($"event_id",
        get_json_object($"props", "$.k").cast("long").as("k_path"),
        element_at(
          from_json($"props", org.apache.spark.sql.types.DataType.fromDDL("map<string,long>")),
          "k").as("k_typed"))
      .orderBy($"event_id")
  }

  /** f17 — the VARIANT path for semi-structured data (Spark 4's
    * open-format binary JSON type — the modern replacement for
    * string-path extraction at scale): `parse_json` decodes each
    * props payload ONCE into the variant binary encoding, typed
    * `variant_get` reads then navigate that encoding without
    * re-parsing text — at 100 TB the parse-once/read-many asymmetry
    * is the whole point (f11's `get_json_object` re-parses the string
    * per path). `try_variant_get` on an absent path proves the
    * lenient-navigation contract (null, not an error) the strict
    * variant would throw on a type mismatch. Grouped integer-only
    * report: per event type, k-count/sum/min/max plus the
    * absent-path null count — no rounding discipline anywhere. */
  def f17Variant(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "events")
      .select($"event_type",
        variant_get(parse_json($"props"), "$.k", "long").as("k"),
        try_variant_get(parse_json($"props"), "$.missing", "long")
          .as("absent"))
      .groupBy($"event_type")
      .agg(count($"k").as("n_k"),
        sum($"k").as("sum_k"),
        min($"k").as("min_k"),
        max($"k").as("max_k"),
        sum(when($"absent".isNull, 1L).otherwise(0L)).as("n_absent"))
      .orderBy($"event_type")
  }

  /** f12 — regex battery: extract, rlike filter, replace. */
  def f12Regexp(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "part")
      .filter($"p_name".rlike("^(cold|small)\\b"))
      .select($"p_partkey",
        regexp_extract($"p_name", "^(\\w+)", 1).as("first_word"),
        regexp_replace($"p_name", "[aeiou]", "_").as("devoweled"))
      .orderBy($"p_partkey")
  }

  /** f13 — date/math battery: truncation, extraction, day arithmetic,
    * floor/ceil/abs/round. date_trunc is emitted as a formatted string so
    * the oracle compare is timestamp-representation-proof. */
  def f13DateMath(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "orders")
      .select($"o_orderkey",
        date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM-dd").as("order_month"),
        year($"o_orderdate").cast("long").as("order_year"),
        month($"o_orderdate").cast("long").as("order_mm"),
        datediff($"o_orderdate", lit("1995-01-01").cast("date")).cast("long").as("days_since_95"),
        floor($"o_totalprice" / 1000).as("price_k"),
        ceil($"o_totalprice" / 1000).as("price_k_up"),
        abs($"o_totalprice" - 250000).as("dist_from_mid"),
        round($"o_totalprice" / 7, 3).as("price_sevenths"))
      .orderBy($"o_orderkey")
  }

  /** f14 — pivot (wide aggregation): quantity sums per linestatus x
    * returnflag. Explicit pivot values keep the plan static (no
    * values-discovery pre-query) — required practice at scale. */
  def f14Pivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .groupBy($"l_linestatus")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(round(sum($"l_quantity"), 2))
      .orderBy($"l_linestatus")
  }

  /** f16 — array higher-order-function battery (SURVEY.md §2b scalar
    * library: element_at/transform/filter/aggregate/zip_with). Folds
    * are left-associative in both engines, so the oracle spells the
    * same floating-point evaluation order and matches bit-exactly. */
  def f16ArrayHof(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val arr = array($"l_quantity", $"l_discount", $"l_tax")
    Tables(s, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_quantity",
        aggregate(transform(arr, x => x * 2), lit(0.0), (acc, x) => acc + x)
          .as("doubled_sum"),
        size(filter(arr, x => x > 0.02)).cast("long").as("n_above"),
        array_min(arr).as("min_el"),
        array_max(arr).as("max_el"),
        aggregate(zip_with(arr, array(lit(1.0), lit(2.0), lit(3.0)), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x).as("weighted"))
      .orderBy($"l_orderkey", $"l_linenumber", $"l_quantity", $"weighted")
  }

  /** f15 — unpivot/melt (long form): lineitem measures to (metric, value)
    * pairs. Spark's native unpivot (no UNION-of-scans: one pass). */
  def f15Unpivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .unpivot(
        Array($"l_orderkey", $"l_linenumber"),
        Array($"l_quantity", $"l_discount", $"l_tax"),
        "metric", "value")
      .orderBy($"l_orderkey", $"l_linenumber", $"metric", $"value")
  }

  /** f18 — XML decode (Spark 4's native `from_xml`, the sibling
    * source format to the reference's JSON ETL): an XML payload with
    * an ATTRIBUTE (`id` -> `_id` under the default attribute prefix)
    * and nested elements is synthesized in-query from integer/string
    * order columns (no doubles — text-formatting a double is the one
    * cross-engine hazard), every 1000th key planted malformed, then
    * parsed back under PERMISSIVE semantics (struct-of-nulls, the
    * P17 tolerance contract) and aggregated per priority. The oracle
    * computes the same aggregate from the ORIGINAL columns, so any
    * parse loss, attribute/element mix-up, or silent drop of the
    * malformed rows hash-fails. Null group = the malformed rows;
    * sort pinned NULLS FIRST on both engines. */
  def f18Xml(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val xml = when($"o_orderkey" % 1000 === 0, lit("<order not xml"))
      .otherwise(concat(lit("<order id=\""), $"o_orderkey",
        lit("\"><cust>"), $"o_custkey",
        lit("</cust><pri>"), $"o_orderpriority", lit("</pri></order>")))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "_id BIGINT, cust BIGINT, pri STRING")
    Tables(s, dir, "orders")
      .select($"o_orderkey", xml.as("payload"))
      .select($"o_orderkey", from_xml($"payload", schema).as("x"))
      .groupBy($"x.pri".as("pri"))
      .agg(count(lit(1)).as("n_orders"),
        count($"x.cust").as("n_parsed"),
        sum($"x.cust").as("sum_cust"),
        count(when($"x._id" === $"o_orderkey", 1)).as("n_id_match"))
      .orderBy($"pri".asc_nulls_first)
  }

  /** f19 — embedded-CSV scalar codec (`to_csv`/`from_csv`): one
    * delimited line as a column VALUE — the message-bus/log payload
    * shape (Kafka values, legacy feeds) where each record's CSV is a
    * field, not a file, so the file-level CSV reader (q34) cannot
    * apply. The to_csv(struct) -> from_csv(schema) roundtrip proves
    * the codec value-exact: the oracle computes the same aggregate
    * straight from the source columns, so any encode/parse drift
    * (quoting, delimiter, double text repr) hash-fails — the q32/q33
    * "format seam must be invisible" contract applied to the scalar
    * codec. Pipe delimiter dodges comma-bearing text; the double
    * survives because to_csv prints a decimal repr that parses back
    * to the identical IEEE value. Both directions are codegen'd
    * narrow maps over the scan; no shuffle until the aggregate. */
  def f19CsvScalar(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import scala.jdk.CollectionConverters._
    val opts = Map("sep" -> "|")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, seg STRING, bal DOUBLE")
    Tables(s, dir, "customer")
      .select(to_csv(struct($"c_custkey".as("k"),
        $"c_mktsegment".as("seg"), $"c_acctbal".as("bal")),
        opts.asJava).as("line"))
      .select(from_csv($"line", schema, opts).as("x"))
      .groupBy($"x.seg".as("seg"))
      .agg(count(lit(1)).as("n_cust"),
        round(sum($"x.bal"), 2).as("sum_bal"),
        min($"x.k").as("min_k"),
        max($"x.k").as("max_k"))
      .orderBy($"seg")
  }

  /** f20 — Avro binary codec battery ([[graft.functions.ToAvro]] /
    * [[graft.functions.FromAvro]] — the engine's native expressions
    * over Avro core, since the `spark-avro` connector module is not
    * on this classpath; see the AvroCodec scaladoc for why the
    * implementation mirrors the connector's public design). The
    * Kafka-adjacent sibling of f19's CSV scalar codec: each
    * customer's (k, seg, bal) encodes to schemaless Avro binary —
    * readers supply the schema, the schema-registry contract — then
    * decodes back under the PERMISSIVE tolerance contract (P17):
    * every 1000th payload is planted corrupt (empty bytes) and must
    * decode to a NULL struct, not fail the job. The oracle computes
    * the same aggregate straight from the source columns with the
    * corrupt keys nulled, so any encode/decode drift — zigzag varint,
    * union branch index, IEEE double bits, UTF-8 bytes — hash-fails.
    * Both directions are narrow per-row maps over the scan
    * (CodegenFallback eval inside the codegen'd stage); no shuffle
    * until the aggregate. */
  def f20Avro(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.graftshim.ColumnBridge.{column => nc, expression => ex}
    val encoded = nc(graft.functions.ToAvroBinary(ex(struct(
      $"c_custkey".as("k"), $"c_mktsegment".as("seg"),
      $"c_acctbal".as("bal")))))
    // empty bytes can never be a valid record here: field 1's union
    // index varint is already missing, so decode EOFs deterministically
    val payload = when($"c_custkey" % 1000 === 0, lit(Array.empty[Byte]))
      .otherwise(encoded)
    Tables(s, dir, "customer")
      .select($"c_custkey", payload.as("payload"))
      .select($"c_custkey", nc(graft.functions.FromAvroBinary(ex($"payload"),
        "k BIGINT, seg STRING, bal DOUBLE")).as("x"))
      .groupBy($"x.seg".as("seg"))
      .agg(count(lit(1)).as("n_cust"),
        count($"x.k").as("n_parsed"),
        round(sum($"x.bal"), 2).as("sum_bal"),
        min($"x.k").as("min_k"),
        max($"x.k").as("max_k"),
        count(when($"x.k" === $"c_custkey", 1)).as("n_id_match"))
      .orderBy($"seg".asc_nulls_first)
  }

  /** f21 — Protobuf wire-format codec battery
    * ([[graft.functions.ToProtoBinary]] /
    * [[graft.functions.FromProtoBinary]], the spec-direct codec — see
    * ProtoCodec's scaladoc): f20's Avro roundtrip repeated over the
    * SECOND standard binary message format, on orders. Encode
    * (okey, pri, price), decode under a WIDER-writer schema drill:
    * the payload also carries a 4th field (o_custkey as proto field
    * 4) the reader's DDL does not know — the decoder must SKIP it by
    * wire type (the schema-evolution contract) and still recover
    * fields 1-3 exactly. Corrupt rows (every 1000th) are a lone tag
    * byte with no payload — a guaranteed truncation → NULL struct
    * under the PERMISSIVE contract. Oracle: the same aggregate from
    * the source columns with corrupt keys nulled (f18/f20 shape). */
  def f21Proto(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.graftshim.ColumnBridge.{column => nc, expression => ex}
    val encoded = nc(graft.functions.ToProtoBinary(ex(struct(
      $"o_orderkey".as("okey"), $"o_orderpriority".as("pri"),
      $"o_totalprice".as("price"), $"o_custkey".as("extra")))))
    // 0x08 = field 1 varint tag with its payload truncated away: the
    // parser hits EOF deterministically (an EMPTY payload would be a
    // VALID all-null proto message — not a corruption case)
    val payload = when($"o_orderkey" % 1000 === 0, lit(Array[Byte](0x08)))
      .otherwise(encoded)
    Tables(s, dir, "orders")
      .select($"o_orderkey", payload.as("payload"))
      .select($"o_orderkey", nc(graft.functions.FromProtoBinary(ex($"payload"),
        "okey BIGINT, pri STRING, price DOUBLE")).as("x"))
      .groupBy($"x.pri".as("pri"))
      .agg(count(lit(1)).as("n_orders"),
        count($"x.okey").as("n_parsed"),
        round(sum($"x.price"), 2).as("sum_price"),
        min($"x.okey").as("min_k"),
        max($"x.okey").as("max_k"),
        count(when($"x.okey" === $"o_orderkey", 1)).as("n_id_match"))
      .orderBy($"pri".asc_nulls_first)
  }
}
