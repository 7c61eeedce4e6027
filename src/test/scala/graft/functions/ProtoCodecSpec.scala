package graft.functions

import graft.SparkSuiteBase
import org.apache.spark.sql.functions._

/** The spec-direct protobuf wire codec (to_proto_bin/from_proto_bin):
  * golden bytes from the protobuf documentation itself, roundtrip
  * exactness, unknown-field skipping (schema evolution), repeated-
  * field last-one-wins, and the PERMISSIVE corruption matrix. */
class ProtoCodecSpec extends SparkSuiteBase {
  import spark.implicits._

  test("golden bytes: the protobuf docs' own examples encode byte-for-byte") {
    GraftFunctions.register(spark)
    // docs/encoding: message Test1 { int32 a = 1; } with a=150
    // serializes to exactly 08 96 01
    val g1 = Seq(Tuple1(150)).toDF("a")
      .select(call_function("to_proto_bin", struct($"a")))
      .as[Array[Byte]].head()
    assert(g1.toSeq == Seq[Byte](0x08, 0x96.toByte, 0x01), g1.toSeq)
    // message Test2 { string b = 2; } with b="testing" → 12 07 + utf8.
    // Field NUMBER 2 = struct position 2, so position 1 rides null
    // (absent on the wire — proto3 optional presence).
    val g2 = Seq((Option.empty[Long], "testing")).toDF("a", "b")
      .select(call_function("to_proto_bin", struct($"a", $"b")))
      .as[Array[Byte]].head()
    assert(g2.toSeq == Seq[Byte](0x12, 0x07) ++
      "testing".getBytes("UTF-8").toSeq, g2.toSeq)
  }

  test("roundtrip is value-exact across all supported scalar types incl. zeros") {
    GraftFunctions.register(spark)
    val ddl = "l BIGINT, i INT, d DOUBLE, f FLOAT, b BOOLEAN, s STRING, y BINARY"
    val df = Seq(
      (0L, 0, 0.0, 0.0f, false, "", Array.empty[Byte]), // explicit presence: zeros survive
      (-1L, -1, -0.0, Float.NaN, true, "ünïcodé ✓", Array[Byte](1, 2)),
      (Long.MinValue, Int.MaxValue, Double.NaN, -3.5f, true, "x", Array[Byte](-1)))
      .toDF("l", "i", "d", "f", "b", "s", "y")
    val back = df.select(call_function("from_proto_bin",
        call_function("to_proto_bin",
          struct($"l", $"i", $"d", $"f", $"b", $"s", $"y")),
        lit(ddl)).as("x"))
      .select($"x.*")
    val norm = (r: org.apache.spark.sql.Row) =>
      r.toSeq.map { case b: Array[Byte] => b.toSeq; case v => v }.toString
    assert(df.collect().map(norm).toSeq == back.collect().map(norm).toSeq)
  }

  test("schema evolution: unknown writer fields skip cleanly for every wire type") {
    GraftFunctions.register(spark)
    // writer has 5 fields (varint, LEN, I64, I32, LEN-bytes tails);
    // reader knows only fields 1-2 — everything after must skip
    val payload = Seq((7L, "keep", 2.5, 1.5f, Array[Byte](9, 9, 9)))
      .toDF("a", "b", "c", "d", "e")
      .select(call_function("to_proto_bin",
        struct($"a", $"b", $"c", $"d", $"e")).as("p"))
    val got = payload.select(call_function("from_proto_bin", $"p",
        lit("a BIGINT, b STRING")).as("x"))
      .select($"x.a", $"x.b").as[(Long, String)].head()
    assert(got == ((7L, "keep")))
  }

  test("repeated occurrence of a scalar field: last one wins (spec rule)") {
    GraftFunctions.register(spark)
    // two encodings of field 1 concatenated — a valid proto stream
    val one = Seq(Tuple1(1L)).toDF("a")
      .select(call_function("to_proto_bin", struct($"a")).as("p"))
      .as[Array[Byte]].head()
    val two = Seq(Tuple1(2L)).toDF("a")
      .select(call_function("to_proto_bin", struct($"a")).as("p"))
      .as[Array[Byte]].head()
    val got = Seq(Tuple1(one ++ two)).toDF("p")
      .select(call_function("from_proto_bin", $"p", lit("a BIGINT")).as("x"))
      .select($"x.a").as[Long].head()
    assert(got == 2L)
  }

  test("PERMISSIVE: truncation and invalid wire types yield NULL; empty bytes are a valid empty message") {
    GraftFunctions.register(spark)
    val bad = Seq(
      Array[Byte](0x08),             // tag, then EOF in varint
      Array[Byte](0x12, 0x05, 0x61), // LEN=5 with 1 byte present
      Array[Byte](0x0F),             // wire type 7 (invalid)
      Array[Byte](0x0B)              // wire type 3 (deprecated group)
    ).toDF("p")
      .select(call_function("from_proto_bin", $"p", lit("a BIGINT")).as("x"))
    assert(bad.filter($"x".isNotNull).count() == 0, bad.collect().toSeq)
    // empty payload = all fields absent = a NON-null struct of nulls
    val empty = Seq(Tuple1(Array.empty[Byte])).toDF("p")
      .select(call_function("from_proto_bin", $"p",
        lit("a BIGINT, b STRING")).as("x"))
    assert(empty.filter($"x".isNull).count() == 0)
    assert(empty.select($"x.a", $"x.b")
      .as[(Option[Long], Option[String])].head() == ((None, None)))
  }
}
