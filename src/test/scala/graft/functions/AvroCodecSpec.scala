package graft.functions

import graft.SparkSuiteBase
import org.apache.spark.sql.functions._

/** The engine-native Avro binary codec (to_avro_bin / from_avro_bin):
  * roundtrip exactness over every supported scalar type, the
  * PERMISSIVE corrupt-payload contract, trailing-garbage rejection,
  * and the SQL registration surface. */
class AvroCodecSpec extends SparkSuiteBase {
  import spark.implicits._

  private val ddl =
    "l BIGINT, i INT, d DOUBLE, f FLOAT, b BOOLEAN, s STRING, y BINARY"

  test("roundtrip is value-exact across all supported scalar types") {
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, 2, 3.5, 4.25f, true, "hello", Array[Byte](1, 2, 3)),
      (-9L, -8, -0.0, Float.MinPositiveValue, false, "ünïcodé ✓",
        Array.empty[Byte]),
      (Long.MaxValue, Int.MinValue, Double.NaN, Float.NaN, true, "", // NaN
        Array[Byte](-1)))
      .toDF("l", "i", "d", "f", "b", "s", "y")
    val back = df.select(call_function("from_avro_bin",
        call_function("to_avro_bin",
          struct($"l", $"i", $"d", $"f", $"b", $"s", $"y")),
        lit(ddl)).as("x"))
      .select($"x.*")
    // compare through show-safe typed collect; NaN == NaN under
    // java equality on boxed doubles via toString compare
    val a = df.collect().map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case v => v }).toSeq
    val b = back.collect().map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case v => v }).toSeq
    assert(a.map(_.toString) == b.map(_.toString), s"$a\n$b")
  }

  test("null fields ride the ['null', T] union and survive") {
    GraftFunctions.register(spark)
    val df = Seq((Some(1L), Option.empty[String]),
        (None: Option[Long], Some("x")))
      .toDF("l", "s")
    val back = df.select(call_function("from_avro_bin",
        call_function("to_avro_bin", struct($"l", $"s")),
        lit("l BIGINT, s STRING")).as("x"))
      .select($"x.l", $"x.s").as[(Option[Long], Option[String])]
      .collect().toSet
    assert(back == Set((Some(1L), None), (None, Some("x"))))
  }

  test("PERMISSIVE: corrupt and truncated payloads decode to a NULL struct") {
    GraftFunctions.register(spark)
    val good = Seq((7L, "ok")).toDF("l", "s")
      .select(call_function("to_avro_bin", struct($"l", $"s")).as("p"))
      .as[Array[Byte]].head()
    val cases = Seq(
      Array.empty[Byte],          // nothing at all
      good.take(2),               // truncated mid-record
      good ++ Array[Byte](0, 1),  // valid record + trailing garbage
      Array[Byte](-1, -1, -1, -1) // union index garbage
    ).toDF("p")
    val decoded = cases.select(call_function("from_avro_bin", $"p",
        lit("l BIGINT, s STRING")).as("x"))
    assert(decoded.filter($"x".isNotNull).count() == 0,
      decoded.collect().mkString(","))
    // and the expression DECLARES nullability (a non-nullable claim
    // here NPEs downstream codegen — the bug this test pins)
    assert(decoded.schema.head.nullable)
  }

  test("decode failure never poisons the task: good rows around bad ones survive") {
    GraftFunctions.register(spark)
    val rows = spark.range(100).toDF("k")
      .select($"k", when($"k" % 10 === 0, lit(Array.empty[Byte]))
        .otherwise(call_function("to_avro_bin", struct($"k"))).as("p"))
      .select($"k", call_function("from_avro_bin", $"p", lit("k BIGINT")).as("x"))
    assert(rows.filter($"x".isNull).count() == 10)
    assert(rows.filter($"x.k" === $"k").count() == 90)
  }

  test("SQL misuse fails at resolution with the function name") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT to_avro_bin(named_struct('a', 1), 2)").collect()
    }
    assert(e.getMessage.contains("to_avro_bin"), e.getMessage)
    val e2 = intercept[Exception] {
      Seq(1L).toDF("l").select(call_function("from_avro_bin",
        call_function("to_avro_bin", struct($"l")), $"l")).collect()
    }
    assert(String.valueOf(e2.getMessage).contains("from_avro_bin"),
      e2.getMessage)
  }
}
