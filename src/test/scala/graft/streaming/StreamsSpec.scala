package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import graft.SparkSuiteBase
import graft.sources.FileQueue
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.functions._

/** Drives the genuinely incremental streaming paths: micro-batches via
  * MemoryStream (windowed agg with watermark, custom state) and the
  * archiving file source (the reference's blob queue, S2/S6). */
class StreamsSpec extends SparkSuiteBase {
  import spark.implicits._

  case class Ev(ts: Timestamp, event_type: String, value: Double, user_id: Long)
  case class Bv(event_id: Long, ts: Timestamp, event_type: String,
      value: Double)
  private def ev(minute: Int, typ: String, v: Double, u: Long = 1L) =
    Ev(Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00"), typ, v, u)

  test("tumbling window aggregation accumulates across micro-batches") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = Streams.tumblingCounts(in.toDF())
      .writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(ev(5, "click", 1.0), ev(10, "click", 2.0))
      q.processAllAvailable()
      in.addData(ev(20, "click", 3.0), ev(25, "view", 4.0))
      q.processAllAvailable()
      val rows = spark.sql(
        """SELECT event_type, max(n_events) AS n, max(sum_value) AS s
          |FROM tumbling GROUP BY event_type""".stripMargin)
        .as[(String, Long, Double)].collect()
        .map { case (k, n, s) => k -> ((n, s)) }.toMap
      assert(rows("click") == ((3L, 6.0))) // all three clicks in the 10:00 window
      assert(rows("view") == ((1L, 4.0)))
    } finally q.stop()
  }

  test("session windows split on gap > timeout and merge within it") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Ev]
    // session aggregation only supports Append: sessions emit once the
    // watermark passes their end — advance it with later flush batches.
    val q = Streams.sessionCounts(in.toDF())
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // minutes 1,5,9 chain (gaps < 10) -> one session; 30 -> a new one
      in.addData(ev(1, "click", 1.0), ev(5, "click", 1.0),
        ev(9, "click", 1.0), ev(30, "click", 1.0))
      q.processAllAvailable()
      in.addData(ev(59, "flush", 0.0, u = 99L)) // watermark -> 10:20
      q.processAllAvailable()
      in.addData(Ev(Timestamp.valueOf("2024-01-01 12:00:00"), "flush", 0.0, 99L))
      q.processAllAvailable() // watermark -> 10:49, session2 finalized
      val rows = spark.sql(
        "SELECT session_start, n_events FROM sessions WHERE user_id = 1")
        .as[(Timestamp, Long)].collect().sortBy(_._1.getTime)
      assert(rows.map(_._2).toSeq == Seq(3L, 1L))
      assert(rows(0)._1 == Timestamp.valueOf("2024-01-01 10:01:00"))
      assert(rows(1)._1 == Timestamp.valueOf("2024-01-01 10:30:00"))
    } finally q.stop()
  }

  test("mapGroupsWithState keeps per-user running totals across batches") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Streams.UserEvent]
    val q = Streams.runningUserStats(in.toDS())
      .writeStream.format("memory").queryName("userstats")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(Streams.UserEvent(1L, 10.0), Streams.UserEvent(2L, 5.0))
      q.processAllAvailable()
      in.addData(Streams.UserEvent(1L, 7.0))
      q.processAllAvailable()
      val latest = spark.sql(
        """SELECT user_id, max(n_events), max(total_value)
          |FROM userstats GROUP BY user_id""".stripMargin)
        .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(latest(1L) == ((2L, 17.0))) // state carried across batches
      assert(latest(2L) == ((1L, 5.0)))
    } finally q.stop()
  }

  test("stream-stream interval join pairs purchases with preceding clicks only") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = Streams.clickToPurchaseJoin(in.toDF())
      .writeStream.format("memory").queryName("ssjoin")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        ev(5, "click", 1.0),       // within 10 min of the purchase -> joins
        ev(12, "purchase", 99.0),
        ev(20, "click", 1.0),      // AFTER the purchase -> must not join
        ev(40, "click", 1.0))      // a later click, no purchase follows
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, click_ts FROM ssjoin")
        .as[(Long, Timestamp)].collect()
      assert(rows.length == 1)
      assert(rows.head._2 == Timestamp.valueOf("2024-01-01 10:05:00"))
    } finally q.stop()
  }

  test("left-outer join: null-side rows emit only after the watermark passes") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = Streams.clickPurchaseLeftJoin(in.toDF())
      .writeStream.format("memory").queryName("lojoin")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        ev(5, "click", 0.0, 1L),      // never matches: user 1 has no purchase
        ev(1, "click", 0.0, 2L),      // matches the purchase 7 min later
        ev(8, "purchase", 9.99, 2L))
      q.processAllAvailable()
      val afterB1 = spark.sql("SELECT user_id, purchase_value FROM lojoin")
        .as[(Long, Option[Double])].collect().toSeq
      // the matched pair emits with the data batch; the unmatched click
      // must NOT have emitted yet — its watermark (10:08 - 10 min) is
      // far short of click_ts + interval (10:15), so a match could
      // still arrive
      assert(afterB1 == Seq((2L, Some(9.99))),
        s"premature outer emission: $afterB1")
      // flush BOTH sides' watermarks (the join takes the min) past
      // 10:15: now — and only now — the null-side row may emit
      in.addData(ev(59, "click", 0.0, 98L), ev(59, "purchase", 0.0, 99L))
      q.processAllAvailable()
      val afterB2 = spark.sql(
        "SELECT user_id, purchase_value FROM lojoin WHERE user_id = 1")
        .as[(Long, Option[Double])].collect().toSeq
      assert(afterB2 == Seq((1L, None)),
        s"unmatched click did not finalize with nulls: $afterB2")
    } finally q.stop()
  }

  test("semi join: a converted click emits exactly once; unconverted never") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = Streams.clickConversionSemiJoin(in.toDF())
      .writeStream.format("memory").queryName("ssemi")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(ev(5, "click", 0.0, 1L), ev(8, "purchase", 1.0, 1L))
      q.processAllAvailable()
      // a SECOND purchase inside the same click's window must not
      // re-emit the click (semi = membership, not fan-out), and an
      // unconverted click never emits at all
      in.addData(ev(9, "purchase", 2.0, 1L), ev(30, "click", 0.0, 2L))
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id FROM ssemi")
        .as[Long].collect().toSeq
      assert(rows == Seq(1L), s"semi join emitted $rows")
    } finally q.stop()
  }

  test("streaming bars: positional open/close across batches; late rows drop") {
    implicit val sc = spark.sqlContext
    def bv(id: Long, minute: Int, v: Double) =
      Bv(id, Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00"), "t", v)
    val in = MemoryStream[Bv]
    val q = Streams.streamingBars(in.toDF())
      .writeStream.format("memory").queryName("sbars")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(bv(1, 20, 5.0), bv(2, 40, 9.0))
      q.processAllAvailable()
      // out-of-order rows land in a LATER batch but their hour window
      // is still open (aggregation state expires by WINDOW end vs
      // watermark, not by row time) — both must fold in, and the
      // positional merge must CORRECT the open to the now-earliest
      // event (10:05) while close stays the latest (10:40)
      in.addData(bv(3, 35, 7.0), bv(4, 5, 1.0))
      q.processAllAvailable()
      // sentinel pushes the watermark past 11:00 -> the bar finalizes
      in.addData(Bv(99L, Timestamp.valueOf("2024-01-01 11:59:00"), "t", 0.0))
      q.processAllAvailable()
      val bars = spark.sql(
        "SELECT open, high, low, close, n_events FROM sbars")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      assert(bars == Seq((100L, 900L, 100L, 900L, 4L)),
        s"bar wrong: $bars")
      // a row behind the now-FINALIZED window drops: no re-emission,
      // no new bar for the closed hour (append-mode exactly-once)
      in.addData(bv(5, 45, 50.0))
      q.processAllAvailable()
      val after = spark.sql("SELECT count(*) FROM sbars")
        .as[Long].head()
      assert(after == 1L, s"closed-window row leaked: $after rows")
    } finally q.stop()
  }

  test("st10: incremental left-outer join equals the batch left join") {
    val sf = "/root/testdata/sf0.001"
    val got = Streams.st10StreamingOuterJoin(spark, sf).collect().toSeq
    val events = graft.Tables(spark, sf, "events")
    val c = events.filter($"event_type" === "click" && $"user_id" % 10 === 0)
      .select($"user_id", $"ts".as("cts"))
    val p = events.filter($"event_type" === "purchase" && $"user_id" % 10 === 0)
      .select($"user_id".as("pu"), $"ts".as("pts"), $"value")
    val expected = c.join(p, $"user_id" === $"pu" &&
        $"pts" >= $"cts" && $"pts" <= $"cts" + expr("INTERVAL 30 MINUTES"),
        "left_outer")
      .select($"user_id", unix_micros($"cts").as("click_ts_us"),
        unix_micros($"pts").as("purchase_ts_us"),
        round($"value", 2).as("purchase_value"))
      .orderBy($"user_id", $"click_ts_us", $"purchase_ts_us".asc_nulls_first)
      .collect().toSeq
    assert(got == expected,
      s"outer join diverged: got ${got.size} rows, expected ${expected.size}")
  }

  test("st20: incremental right-outer join equals the batch right join; purchase-only rows emit") {
    val sf = "/root/testdata/sf0.001"
    val got = Streams.st20StreamingRightJoin(spark, sf).collect().toSeq
    val events = graft.Tables(spark, sf, "events")
    val c = events.filter($"event_type" === "click" && $"user_id" % 10 === 4)
      .select($"user_id".as("cu"), $"ts".as("cts"))
    val p = events.filter($"event_type" === "purchase" && $"user_id" % 10 === 4)
      .select($"user_id", $"ts".as("pts"), $"value")
    val expected = c.join(p, $"user_id" === $"cu" &&
        $"pts" >= $"cts" && $"pts" <= $"cts" + expr("INTERVAL 30 MINUTES"),
        "right_outer")
      .select($"user_id", unix_micros($"cts").as("click_ts_us"),
        unix_micros($"pts").as("purchase_ts_us"),
        round($"value", 2).as("purchase_value"))
      .orderBy($"user_id", $"click_ts_us".asc_nulls_first, $"purchase_ts_us")
      .collect().toSeq
    assert(got == expected,
      s"right-outer diverged: got ${got.size} rows, expected ${expected.size}")
    // the side st10 cannot emit: purchases with no covering click
    assert(got.exists(_.isNullAt(1)), "no unmatched purchase emitted")
    // and a right-outer never emits a click-only row
    assert(got.forall(!_.isNullAt(2)), "click-only row under right_outer")
  }

  test("streamingDedup drops watermark-horizon re-deliveries, keeps firsts") {
    implicit val sc = spark.sqlContext
    case class Doc(ts: Timestamp, text: String)
    val in = MemoryStream[(Timestamp, String)]
    val q = Streams.streamingDedup(
        in.toDF().toDF("ts", "text"))
      .writeStream.format("memory").queryName("dedupstream")
      .outputMode(OutputMode.Append).start()
    def t(minute: Int) = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")
    try {
      in.addData((t(1), "hello world"), (t(2), "Hello  World"), (t(3), "other"))
      q.processAllAvailable()
      in.addData((t(4), "hello world")) // re-delivery in a later batch
      q.processAllAvailable()
      val texts = spark.sql("SELECT text FROM dedupstream")
        .as[String].collect().toSeq
      // normalized dup ("Hello  World") and the cross-batch re-delivery
      // are both dropped; exactly one hello + one other survive
      assert(texts.sorted == Seq("hello world", "other"))
    } finally q.stop()
  }

  test("nearDupIngestGate: banded path admits far docs, blocks near ones, plans NO nested-loop join") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    // the standing fingerprints are the gate inputs' OWN simhashes —
    // computed through the same expression, so "identical text" is
    // hamming 0 (blocked at any radius) and distinct texts on this
    // corpus-free toy are far apart (admitted)
    val standing = spark.createDataFrame(Seq(Tuple1(0L))).toDF("seed")
      .select(graft.ops.TextDedup.simhash(
        org.apache.spark.sql.functions.lit(
          "the quick brown fox jumps over the lazy dog")).as("fp"))
    def t(minute: Int) = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")
    val q = Streams.nearDupIngestGate(
        in.toDF().toDF("doc_id", "ts", "text"), standing, maxHamming = 6)
      .writeStream.format("memory").queryName("gatestream")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        (1L, t(1), "the quick brown fox jumps over the lazy dog"), // exact
        (2L, t(2), "completely different content about spark plans"),
        (2L, t(3), "completely different content about spark plans")) // re-delivery
      q.processAllAvailable()
      val admitted = spark.sql("SELECT doc_id FROM gatestream")
        .as[Long].collect().toSeq.sorted
      // doc 1 is hamming-0 from the standing fp (blocked); doc 2 is far
      // (admitted once — the within-watermark dedup eats the re-delivery)
      assert(admitted == Seq(2L), s"gate admitted $admitted")
      // the micro-batch physical plan must hold banded equi-joins only —
      // the broadcast nested loop over a lake-growing fp table is the
      // r17-flagged scale cliff (legal solely on the radius>7 fallback)
      val buf = new java.io.ByteArrayOutputStream()
      scala.Console.withOut(new java.io.PrintStream(buf)) { q.explain() }
      val plan = buf.toString
      assert(plan.contains("Join"), s"no join in gate plan:\n$plan")
      assert(!plan.contains("NestedLoop"),
        s"banded gate must not plan a nested-loop join:\n$plan")
    } finally q.stop()
  }

  test("nearDupIngestGate: duplicate standing fps change nothing, and the fp cache is registered + releasable") {
    implicit val sc = spark.sqlContext
    Streams.releaseGateCaches(): Unit // drain caches from other tests
    val in = MemoryStream[(Long, Timestamp, String)]
    // a crawl lake is full of exact duplicates — identical texts give
    // identical fps; the gate's answer must not depend on multiplicity
    // (the distinct-before-banding contract, advisor r18)
    val standing = Seq.fill(4)("the quick brown fox jumps over the lazy dog")
      .toDF("t")
      .select(graft.ops.TextDedup.simhash($"t").as("fp"))
    def t(minute: Int) = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")
    val q = Streams.nearDupIngestGate(
        in.toDF().toDF("doc_id", "ts", "text"), standing, maxHamming = 6)
      .writeStream.format("memory").queryName("gatedup")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        (1L, t(1), "the quick brown fox jumps over the lazy dog"),
        (2L, t(2), "completely different content about spark plans"))
      q.processAllAvailable()
      val admitted = spark.sql("SELECT doc_id FROM gatedup")
        .as[Long].collect().toSeq.sorted
      assert(admitted == Seq(2L), s"gate admitted $admitted")
    } finally q.stop()
    // the gate registered its persisted distinct-fp frame; the owner
    // can free it after stopping — and the registry drains
    assert(Streams.releaseGateCaches() >= 1,
      "gate must register its fp cache for release")
    assert(Streams.releaseGateCaches() == 0)
  }

  test("file-queue stream reads docs and archives consumed files (S6)") {
    val in = Files.createTempDirectory("graft-stream-in")
    val archive = Files.createTempDirectory("graft-stream-archive")
    val ckpt = Files.createTempDirectory("graft-stream-ckpt")
    val out = Files.createTempDirectory("graft-stream-out")
    Files.writeString(in.resolve("a_action.json"), """{"v": 1}""")
    Files.writeString(in.resolve("b_action.json"), """{"v": 2}""")
    Files.writeString(in.resolve("z_corrupt.json"), """{"v": broken""")
    val schema = FileQueue.inferSchema(spark, in.toString)
    def runOnce(): Unit = {
      val q = FileQueue.stream(spark, in.toString, archive.toString, schema)
        .writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      q.stop()
    }
    runOnce()
    val read = spark.read.parquet(out.toString)
    assert(read.count() == 2)
    assert(read.columns.contains("source_file"))
    // The source archives batch N's files when committing it, which
    // happens as the NEXT batch is constructed — run a second cycle
    // (new file -> new batch) to observe the archival of the first two.
    Files.writeString(in.resolve("c_action.json"), """{"v": 3}""")
    runOnce()
    val archived = Files.walk(archive).filter(_.toString.endsWith(".json")).count()
    assert(archived >= 2, s"expected first batch archived, got $archived")
    assert(spark.read.parquet(out.toString).count() == 3)
  }

  test("st05: incremental stream-stream join equals the batch interval join") {
    val sf = "/root/testdata/sf0.001"
    val got = Streams.st05StreamingJoin(spark, sf).collect().toSeq
    val events = graft.Tables(spark, sf, "events")
    val p = events.filter($"event_type" === "purchase" && $"user_id" % 10 === 0)
      .select($"user_id", $"ts".as("pts"), $"value")
    val c = events.filter($"event_type" === "click")
      .select($"user_id".as("cu"), $"ts".as("cts"))
    val expected = p.join(c, $"user_id" === $"cu" &&
        $"cts" >= $"pts" - expr("INTERVAL 30 MINUTES") && $"cts" <= $"pts")
      .select($"user_id", unix_micros($"pts").as("purchase_ts_us"),
        round($"value", 2).as("purchase_value"),
        unix_micros($"cts").as("click_ts_us"))
      .orderBy($"user_id", $"purchase_ts_us", $"click_ts_us")
      .collect().toSeq
    assert(got == expected,
      s"streaming join diverged: got ${got.size} rows, expected ${expected.size}")
  }

  test("st06: planted re-deliveries vanish — sink equals the distinct slice") {
    val sf = "/root/testdata/sf0.001"
    val got = Streams.st06StreamingDedup(spark, sf).collect().toSeq
    val expected = graft.Tables(spark, sf, "events")
      .filter($"user_id" % 10 === 0)
      .select($"event_id", unix_micros($"ts").as("ts_us"), $"event_type")
      .orderBy($"event_id")
      .collect().toSeq
    assert(got == expected,
      s"dedup diverged: got ${got.size} rows, expected ${expected.size}")
  }

  test("st07: incremental stream-static enrichment equals the batch join") {
    val sf = "/root/testdata/sf0.001"
    val got = Streams.st07StreamStaticEnrich(spark, sf).collect().toSeq
    val events = graft.Tables(spark, sf, "events")
    val profile = events.groupBy($"user_id")
      .agg(count(lit(1)).as("n_hist"), round(avg($"value"), 4).as("avg_value"))
    val expected = events
      .filter($"user_id" % 10 === 0 && $"event_type" === "purchase")
      .join(profile, "user_id")
      .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"),
        $"value", $"n_hist", $"avg_value")
      .orderBy($"event_id")
      .collect().toSeq
    assert(got == expected,
      s"enrichment diverged: got ${got.size} rows, expected ${expected.size}")
  }

  test("st08: custom state survives the replay — totals equal the batch aggregate") {
    val sf = "/root/testdata/sf0.001"
    val got = Streams.st08RunningStats(spark, sf).collect().toSeq
    val expected = graft.Tables(spark, sf, "events")
      .filter($"user_id" % 10 === 0)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        round(sum($"value"), 2).as("total_value"))
      .orderBy($"user_id")
      .collect().toSeq
    assert(got == expected,
      s"state diverged: got ${got.size} rows, expected ${expected.size}")
  }

  test("upsertLatest: idempotent under batch re-delivery, replay-order independent") {
    val b1 = Seq((1L, 10L, 1.0), (2L, 10L, 2.0), (1L, 20L, 3.0))
      .toDF("k", "seq", "v")
    val b2 = Seq((2L, 30L, 4.0), (3L, 5L, 5.0)).toDF("k", "seq", "v")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"k").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val once = graft.Graft.upsertLatest(
      Some(graft.Graft.upsertLatest(None, b1, "k", Seq("seq"))),
      b2, "k", Seq("seq"))
    // re-delivering b2 must be a fixed point
    val twice = graft.Graft.upsertLatest(Some(once), b2, "k", Seq("seq"))
    assert(rows(once) == rows(twice), "re-delivered batch changed the sink")
    // replay order must not matter: b2 then b1 gives the same table
    val reversed = graft.Graft.upsertLatest(
      Some(graft.Graft.upsertLatest(None, b2, "k", Seq("seq"))),
      b1, "k", Seq("seq"))
    assert(rows(once) == rows(reversed), "arrival order decided a winner")
    assert(rows(once) == Seq((1L, 20L, 3.0), (2L, 30L, 4.0), (3L, 5L, 5.0)))
  }

  test("st11: the foreachBatch upsert sink equals the batch latest-per-user") {
    val sf = "/root/testdata/sf0.001"
    val got = Streams.st11ForeachBatchUpsert(spark, sf).collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    val expected = graft.Tables(spark, sf, "events")
      .filter($"user_id" % 10 === 1)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_id", $"event_type",
        round($"value", 2).as("value"))
      .orderBy($"user_id")
      .collect().toSeq
    assert(got == expected,
      s"upsert sink diverged: got ${got.size} rows, expected ${expected.size}")
  }

  test("st19: the streaming sketch-merge loop equals the batch from-scratch sketch") {
    val sf = "/root/testdata/sf0.001"
    val got = Streams.st19SketchMonitor(spark, sf).collect().toSeq
    val slice = graft.Tables(spark, sf, "events")
      .filter($"user_id" % 5 === 1)
      .select($"event_type",
        round($"value" * 100).cast("long").as("cents"))
    val expected = graft.Graft.hdrQuantiles(slice, "event_type", $"cents",
        Seq(500, 950, 990))
      .orderBy($"event_type", $"permille")
      .collect().toSeq
    assert(got == expected,
      s"streaming sketch diverged: got ${got.size}, expected ${expected.size}")
  }

  test("st12: checkpointed catch-ups land the slice exactly once; re-runs are no-ops") {
    val sf = "/root/testdata/sf0.001"
    val expected = graft.Tables(spark, sf, "events")
      .filter($"user_id" % 10 === 3)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        round(sum($"value"), 2).as("sum_value"),
        min($"event_id").as("min_id"), max($"event_id").as("max_id"))
      .orderBy($"event_type").collect().toSeq
    // first build: launch 1 drains the 6-file backlog, gen-2 lands,
    // launch 2 (same checkpoint) appends only the delta
    val got = Streams.st12FileBackfill(spark, sf).collect().toSeq
    assert(got == expected, s"sink diverged after two catch-ups:\n$got\nvs\n$expected")
    // rebuild in the same JVM: both catch-ups find a caught-up
    // checkpoint and commit NOTHING — any re-processing would double
    // counts here
    val again = Streams.st12FileBackfill(spark, sf).collect().toSeq
    assert(again == expected, "a re-run re-processed already-seen files")
    // the landing dir really held two generations (6 + 3 data files)
    val root = graft.ops.Layout.tmpPath("st12", sf)
    val srcFiles = Option(new java.io.File(s"$root/src").listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).toSeq
    assert(srcFiles.count(_.getName.startsWith("gen2_")) == 3)
    assert(srcFiles.count(_.getName.startsWith("part-")) == 6)
  }

  test("st13: incremental session windows equal the batch session_window result") {
    val sf = "/root/testdata/sf0.001"
    val got = Streams.st13StreamingSessions(spark, sf).collect().toSeq
    assert(got.nonEmpty)
    val expected = graft.Tables(spark, sf, "events")
      .filter($"user_id" % 10 === 4)
      .groupBy(session_window($"ts", "10 minutes"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .select(unix_micros($"session_window.start").as("session_start_us"),
        unix_micros($"session_window.end").as("session_end_us"),
        $"user_id", $"n_events")
      .orderBy($"user_id", $"session_start_us")
      .collect().toSeq
    assert(got == expected,
      s"incremental sessions diverged: ${got.size} vs ${expected.size} rows")
    // the replay genuinely crossed a batch boundary mid-stream, so at
    // least one session merged across micro-batches unless every
    // session fit one chunk — sanity: multi-event sessions exist
    assert(got.exists(_.getLong(3) > 1), "no multi-event session to merge")
  }

  test("st14: update mode emits a real per-key delta history; final state equals batch") {
    val sf = "/root/testdata/sf0.001"
    val got = Streams.st14UpdateWindows(spark, sf).collect().toSeq
    val expected = graft.Tables(spark, sf, "events")
      .filter($"user_id" % 10 === 5)
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n_events"),
        round(sum($"value"), 2).as("sum_value"))
      .select(unix_micros($"window.start").as("window_start_us"),
        $"event_type", $"n_events", $"sum_value")
      .orderBy($"window_start_us", $"event_type")
      .collect().toSeq
    assert(got == expected, s"${got.size} vs ${expected.size} rows")
    // delta emission is REAL: a hand-built replay whose two batches
    // hit the SAME window key must leave two history rows for it in
    // the raw sink (the corpus replay's chunk edges can legitimately
    // align to window edges, so the property is pinned on a stream
    // built to cross one)
    def hb(m: Int) = (java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00"),
      "click", 1.0)
    val sink = Streams.replay(spark, Seq(hb(5), hb(10), hb(20), hb(25)),
        org.apache.spark.sql.streaming.OutputMode.Update, "st14spec",
        nChunks = 2) { ds =>
      Streams.tumblingCounts(ds.toDF("ts", "event_type", "value"))
    }
    val hist = sink.orderBy($"n_events").collect()
    assert(hist.length == 2, s"expected 2 updates, got ${hist.toSeq}")
    assert(hist.map(_.getAs[Long]("n_events")).toSeq == Seq(2L, 4L),
      s"delta history wrong: ${hist.toSeq}")
  }

  test("st15: transformWithState top-k state survives micro-batches") {
    val sf = "/root/testdata/sf0.001"
    val got = Streams.st15TransformWithState(spark, sf).collect().toSeq
    val slice = graft.Tables(spark, sf, "events")
      .filter($"user_id" % 10 === 6)
    val tot = slice.groupBy($"user_id").agg(count(lit(1)).as("n_seen"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"value".desc, $"event_id")
    val expected = slice
      .withColumn("topk_rank", row_number().over(w))
      .filter($"topk_rank" <= 3)
      .join(tot, "user_id")
      .select($"user_id", $"n_seen", $"topk_rank", $"event_id", $"value")
      .orderBy($"user_id", $"topk_rank")
      .collect().toSeq
    assert(got == expected, s"${got.size} vs ${expected.size} rows")
    // cross-batch state survival pinned directly: the global max value
    // arrives in BATCH 1 and must still lead the top list emitted in
    // batch 2 — a ListState that failed to persist would rank batch
    // 2's own values first. Update-history depth is asserted too (the
    // key emits once per batch, so 2 + 3 rank rows in the raw sink).
    val rocks = Seq("spark.sql.streaming.stateStore.providerClass" ->
      ("org.apache.spark.sql.execution.streaming." +
        "state.RocksDBStateStoreProvider"))
    val sink = Streams.replay(spark,
        Seq(Streams.TwsIn(1L, 101L, 9.0), Streams.TwsIn(1L, 102L, 1.0),
          Streams.TwsIn(1L, 103L, 5.0)),
        org.apache.spark.sql.streaming.OutputMode.Update, "st15spec",
        nChunks = 2, confs = rocks) { ds =>
      import ds.sparkSession.implicits._
      ds.groupByKey(_.user_id)
        .transformWithState(new Streams.TopKProcessor(3),
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Update)
        .toDF()
    }
    val rows = sink.orderBy($"n_seen", $"topk_rank").collect()
    assert(rows.length == 5, s"expected 2+3 emission rows, got ${rows.toSeq}")
    val finalTop = rows.filter(_.getAs[Long]("n_seen") == 3L)
      .map(r => (r.getAs[Int]("topk_rank"), r.getAs[Long]("event_id"),
        r.getAs[Double]("value"))).toSeq
    assert(finalTop == Seq((1, 101L, 9.0), (2, 103L, 5.0), (3, 102L, 1.0)),
      s"batch-1 max did not survive the state store: $finalTop")
  }

  test("st17: full-outer interval join emits BOTH null sides") {
    val sf = "/root/testdata/sf0.001"
    val rows = Streams.st17StreamingFullJoin(spark, sf).collect()
    val clickOnly = rows.count(_.isNullAt(2))
    val purchaseOnly = rows.count(_.isNullAt(1))
    assert(clickOnly > 0, "no unmatched clicks — left-null side dead")
    assert(purchaseOnly > 0, "no unmatched purchases — the side st10 cannot emit")
    // every purchase of the slice is accounted for exactly once per
    // matching click, or once with a null click side
    val nPurchases = graft.Tables(spark, sf, "events")
      .filter($"user_id" % 10 === 2 && $"event_type" === "purchase")
      .count()
    val purchaseRows = rows.count(!_.isNullAt(2))
    assert(purchaseRows >= nPurchases,
      s"purchases lost: $purchaseRows rows for $nPurchases purchases")
  }

  test("st16: chained windowed aggs equal the batch two-level rollup") {
    val sf = "/root/testdata/sf0.001"
    val got = Streams.st16ChainedWindows(spark, sf).collect().toSeq
    val ten = graft.Tables(spark, sf, "events")
      .filter($"user_id" % 10 === 8)
      .groupBy(window($"ts", "10 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("n10"))
    val expected = ten
      .groupBy(window(window_time($"w"), "1 hour").as("h"), $"event_type")
      .agg(sum($"n10").as("n_events"), max($"n10").as("max_burst"))
      .select(unix_micros($"h.start").as("hour_start_us"),
        $"event_type", $"n_events", $"max_burst")
      .orderBy($"hour_start_us", $"event_type")
      .collect().toSeq
    assert(got == expected, s"${got.size} vs ${expected.size} rows")
    // the two-stage fold pinned on a hand-built stream (the sf0.001
    // slice is too sparse to guarantee an hour with two 10-min
    // buckets): 3 clicks split 2/1 across two 10-min windows of ONE
    // hour must emit n_events=3 with max_burst=2 — an engine that
    // dropped the inner window would report burst 3, one that dropped
    // the outer would emit two rows
    def ev(m: Int) = (java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00"),
      "click")
    val sentinel = (java.sql.Timestamp.valueOf("2024-01-02 10:00:00"), "zz")
    val sink = Streams.replay(spark, Seq(ev(1), ev(2), ev(11), sentinel),
        org.apache.spark.sql.streaming.OutputMode.Append, "st16spec",
        nChunks = 2, noData = true) { ds =>
      ds.toDF("ts", "event_type")
        .withWatermark("ts", "10 minutes")
        .groupBy(window($"ts", "10 minutes"), $"event_type")
        .agg(count(lit(1)).as("n10"))
        .groupBy(window(window_time($"window"), "1 hour"), $"event_type")
        .agg(sum($"n10").as("n_events"), max($"n10").as("max_burst"))
    }
    val rows = sink.filter($"event_type" === "click")
      .select($"n_events", $"max_burst").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((3L, 2L)), rows.toSeq.toString)
  }

  test("st04: every event lands in exactly two sliding windows, starts 5-min aligned") {
    val sf = "/root/testdata/sf0.001"
    val df = Streams.st04SlidingWindows(spark, sf)
    val total = df.agg(sum($"n_events")).head().getLong(0)
    val nEvents = graft.Tables(spark, sf, "events").count()
    assert(total == 2 * nEvents,
      s"10min/5min slide must duplicate each event twice: $total vs ${2 * nEvents}")
    val fiveMinUs = 5L * 60 * 1000 * 1000
    val misaligned = df.filter(pmod($"window_start_us", lit(fiveMinUs)) =!= 0).count()
    assert(misaligned == 0, "window starts must sit on the 5-minute grid")
  }

  test("st21: SpaceSaving eviction holds the sketch invariants under capacity pressure") {
    // one key, capacity 4, 9 distinct items, heavy item 1 (50 of 58
    // arrivals) — eviction MUST happen; the assertions below hold for
    // ANY within-batch arrival order (the exact-regime oracle gate is
    // st21's job, this pins the eviction path):
    //   Σ cnt == n (each arrival bumps exactly one counter by 1)
    //   ≤ capacity counters survive
    //   est ≥ true ≥ est − err for the reported heavy item
    val data: Seq[Streams.HhIn] =
      (1 to 30).map(_ => Streams.HhIn("k", 1L)) ++
        (2L to 9L).map(Streams.HhIn("k", _)) ++
        (1 to 20).map(_ => Streams.HhIn("k", 1L))
    val sink = Streams.replay(spark, data,
        org.apache.spark.sql.streaming.OutputMode.Update, "st21spec",
        nChunks = 2,
        confs = Seq("spark.sql.streaming.stateStore.providerClass" ->
          ("org.apache.spark.sql.execution.streaming." +
            "state.RocksDBStateStoreProvider"))) { ds =>
      import ds.sparkSession.implicits._
      ds.groupByKey(_.event_type)
        .transformWithState(new Streams.SpaceSavingProcessor(4, 4),
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Update)
        .toDF()
    }
    val fin = sink.orderBy($"n_seen".desc, $"hh_rank").collect()
      .filter(_.getAs[Long]("n_seen") == 58L)
    assert(fin.nonEmpty && fin.length <= 4, s"final emission: ${fin.toSeq}")
    assert(fin.map(_.getAs[Long]("est_cnt")).sum == 58L,
      s"count mass not conserved: ${fin.toSeq}")
    val heavy = fin.find(_.getAs[Long]("user_id") == 1L).getOrElse(
      fail(s"heavy item evicted — SpaceSaving guarantee broken: ${fin.toSeq}"))
    val est = heavy.getAs[Long]("est_cnt")
    val err = heavy.getAs[Long]("err")
    assert(est >= 50L && est - err <= 50L,
      s"heavy-item bounds violated: est=$est err=$err true=50")
    assert(heavy.getAs[Int]("hh_rank") == 1, "heavy item must rank first")
  }
}
