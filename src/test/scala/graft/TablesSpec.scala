package graft

import org.apache.spark.sql.types.TimestampType

/** Smoke tests over the REAL harness testdata, not fixtures. The entire
  * round-9 regression (driver regenerated events.parquet with a new
  * physical timestamp encoding; the reader threw at analysis for 15
  * queries, 11 tests, and the bench) was invisible to every
  * fixture-based suite — this one fails the moment any harness table
  * stops reading, at the same path the driver's Verify/Bench use. */
class TablesSpec extends SparkSuiteBase {

  private val sf = "/root/testdata/sf0.01"

  test("every harness table reads and is non-empty at sf0.01") {
    val counts = Tables.names.map { n =>
      val c = try Tables(spark, sf, n).count()
      catch { case scala.util.control.NonFatal(e) =>
        fail(s"table $n failed to read: ${e.getClass.getSimpleName}: " +
          String.valueOf(e.getMessage).linesIterator.take(2).mkString(" "))
      }
      n -> c
    }
    val empty = counts.filter(_._2 == 0L)
    assert(empty.isEmpty, s"empty harness tables: ${empty.map(_._1).mkString(", ")}")
  }

  test("events.ts normalizes to plain TimestampType at every SF") {
    // The contract every event-time operator (windows, watermarks, the
    // DuckDB oracle's timestamp compare) depends on: whatever physical
    // encoding the driver writes — nanos-as-long (rounds ≤8) or
    // TIMESTAMP_MICROS/NTZ (round 9+) — the Tables reader must surface
    // exactly TimestampType. A future testdata regeneration then flips
    // this one test, not 15 queries.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val dt = Tables(spark, dir, "events").schema("ts").dataType
      assert(dt == TimestampType, s"$dir/events.parquet: ts read as $dt")
    }
  }

  test("events reader still handles the legacy nanos-as-long encoding") {
    // Synthesize what rounds ≤8 shipped: ts as a raw int64 of
    // nanos-since-epoch (what TIMESTAMP(NANOS) reads as under
    // nanosAsLong=true). The reader must shim it to the same
    // TimestampType wall-clock as the native-timestamp path.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-events-nanos").toString
    Seq((1704103200123456789L, 7L, "click", 1.5))
      .toDF("ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Tables(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    val ts = df.select($"ts".cast("string")).as[String].head()
    assert(ts == "2024-01-01 10:00:00.123456", s"nanos shim produced $ts")
  }
}
