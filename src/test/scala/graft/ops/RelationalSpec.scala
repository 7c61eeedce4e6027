package graft.ops

import graft.SparkSuiteBase

/** Plan-shape and semantics checks for the relational battery at
  * sf0.001 (value-level correctness is covered by the DuckDB oracle
  * gate; these assert the *physical plans* scale right — pushdown,
  * broadcast, partial aggregation — which the oracle can't see). */
class RelationalSpec extends SparkSuiteBase {
  private val sf = "/root/testdata/sf0.001"

  private def physicalPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q01: filter is pushed down to the parquet scan") {
    val plan = Relational.q01PricingSummary(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"no pushdown in:\n$plan")
  }

  test("q01: aggregation is partial+final (map-side combine before exchange)") {
    val plan = physicalPlan(Relational.q01PricingSummary(spark, sf))
    assert(plan.contains("partial_sum") || plan.contains("partial_"),
      s"no partial aggregation in:\n$plan")
  }

  test("q02: dimension joins broadcast, not shuffle") {
    val plan = physicalPlan(Relational.q02StarJoin(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
  }

  test("q02: column pruning reaches the lineitem scan") {
    val plan = physicalPlan(Relational.q02StarJoin(spark, sf))
    // lineitem has 11 columns; the query needs 3.
    val scanLine = plan.linesIterator.find(l =>
      l.contains("lineitem.parquet") && l.contains("ReadSchema")).getOrElse("")
    assert(scanLine.contains("l_orderkey") && scanLine.contains("l_extendedprice"))
    assert(!scanLine.contains("l_shipdate") && !scanLine.contains("l_comment"),
      s"scan reads more than needed: $scanLine")
  }

  test("q03: top-k compiles to TakeOrderedAndProject, not a global sort") {
    val plan = physicalPlan(Relational.q03TopOrders(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), s"global sort in:\n$plan")
  }

  test("q06: 3-row bucket dim uses a broadcast nested loop, both sides never shuffle") {
    val plan = physicalPlan(Relational.q06RangeJoin(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin"), s"range join plan:\n$plan")
  }

  test("q16: as-of join is a single window pass — no join operator at all") {
    val plan = physicalPlan(Relational.q16AsOfJoin(spark, sf))
    assert(!plan.contains("Join"), s"as-of should be join-free:\n$plan")
    assert(plan.contains("Window"))
  }

  test("q29: LOCF carries the latest purchase forward per user, null before the first") {
    import spark.implicits._
    val us = 1000L * 1000
    val nanos = (m: Long) => m * 60 * us * 1000 // minutes -> parquet nanos
    val dir = java.nio.file.Files.createTempDirectory("graft-q29").toString
    Seq( // (event_id, user_id, event_type, value, ts-nanos)
      (1L, 7L, "click", 5.0, nanos(0)),
      (2L, 7L, "purchase", 10.0, nanos(1)),
      (3L, 7L, "click", 7.0, nanos(2)),
      (4L, 7L, "purchase", 20.0, nanos(3)),
      (5L, 7L, "view", 9.0, nanos(4)),
      (6L, 8L, "click", 1.0, nanos(0))) // user with no purchases at all
      .toDF("event_id", "user_id", "event_type", "value", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Relational.q29FillGaps(spark, dir)
      .select($"event_id", $"last_purchase_value", $"first_purchase_value")
      .as[(Long, Option[Double], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((None, Some(10.0))))   // before any purchase
    assert(got(2L) == ((Some(10.0), Some(10.0))))
    assert(got(3L) == ((Some(10.0), Some(10.0))))
    assert(got(4L) == ((Some(20.0), Some(10.0))))
    assert(got(5L) == ((Some(20.0), Some(10.0))))
    assert(got(6L) == ((None, None)))         // no purchase ever -> both null
  }

  test("q29 plan: both windows share ONE hash exchange on user_id") {
    val plan = physicalPlan(Relational.q29FillGaps(spark, sf))
    val exchanges = "hashpartitioning\\(user_id".r
      .findAllMatchIn(plan).length
    assert(exchanges == 1,
      s"expected one shared window exchange, got $exchanges:\n$plan")
  }

  test("d10: fuzzy match honors the block+verify contract exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-d10").toString
    Seq((12L, "Customer#000000012"), (13L, "Customer#000000013"),
        (912L, "Customer#000000912"))
      .toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((12L, "Supplier#000000012"), (99L, "Supplier#000000099"))
      .toDF("s_suppkey", "s_name")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    val got = Relational.d10FuzzyJoin(spark, dir)
      .as[(Long, Long, Long)].collect().toSet
    // 12-12 exact (dist 0); 13-12 one substitution (dist 1);
    // 13-99 dist 2 -> dropped by verify; 912-12 would be dist 1 but its
    // BLOCK differs in digit 7 -> dropped by the blocking contract
    assert(got == Set((12L, 12L, 0L), (13L, 12L, 1L)), s"got $got")
  }

  test("d10 plan: supplier side broadcasts; levenshtein runs on candidates only") {
    val plan = physicalPlan(Relational.d10FuzzyJoin(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"blocking join must broadcast the dimension side:\n$plan")
  }

  test("q26: salted two-phase aggregation equals the plain groupBy") {
    import org.apache.spark.sql.functions._
    val got = Relational.q26SaltedAgg(spark, sf).collect().toSeq
    val plain = graft.Tables(spark, sf, "lineitem")
      .groupBy(col("l_suppkey"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("n_rows"),
        round(avg(col("l_quantity")), 4).as("avg_qty"))
      .orderBy(col("l_suppkey")).collect().toSeq
    assert(got == plain)
  }

  test("q26 plan: phase-1 exchange partitions on (key, salt)") {
    val plan = physicalPlan(Relational.q26SaltedAgg(spark, sf))
    assert(plan.contains("__salt"),
      s"salt column must reach the phase-1 exchange:\n$plan")
  }

  test("q28 plan: one partitioned window pass, no global single-partition sort") {
    val plan = physicalPlan(Relational.q28Ntile(spark, sf))
    assert(plan.contains("Window"), s"no window operator:\n$plan")
    // a GLOBAL ntile would plan Exchange SinglePartition before the
    // window — the partitioned spelling must not
    val windowIdx = plan.indexOf("Window")
    assert(!plan.substring(windowIdx).contains("SinglePartition"),
      s"window must partition by priority, not funnel one task:\n$plan")
  }

  test("q27: LATERAL limit decorrelates — no per-nation re-execution, <= 2 rows per nation") {
    val df = Relational.q27Lateral(spark, sf)
    val plan = physicalPlan(df)
    assert(!plan.contains("CartesianProduct"),
      s"lateral must not plan a cartesian product:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val maxPerNation = rows.groupBy(_.getString(0)).values.map(_.length).max
    assert(maxPerNation <= 2, s"lateral LIMIT 2 violated: $maxPerNation")
  }

  test("scd2Merge: all four merge paths on a hand-built dimension") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // key 1: changed delta; key 2: no delta; key 3: no-op delta
    // (identical values); key 4: already-closed history row only;
    // key 9: brand-new key
    val dim = Seq(
      (1L, 10.0, "A", "2019-01-01", null.asInstanceOf[String], true),
      (2L, 20.0, "B", "2019-01-01", null.asInstanceOf[String], true),
      (3L, 30.0, "C", "2019-01-01", null.asInstanceOf[String], true),
      (4L, 40.0, "D", "2018-01-01", "2019-01-01", false)
    ).toDF("k", "bal", "seg", "valid_from", "valid_to", "is_current")
    val delta = Seq(
      (1L, 11.0, "A2", "2019-06-01"),
      (3L, 30.0, "C", "2019-06-01"),
      (9L, 90.0, "Z", "2019-06-01")
    ).toDF("k", "bal", "seg", "eff")
    val out = graft.Graft.scd2Merge(dim, delta, "k", Seq("bal", "seg"), "eff")
      .orderBy($"k", $"valid_from").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2),
        r.getString(3), r.getString(4), r.getBoolean(5)))
    assert(out.toSeq == Seq(
      (1L, 10.0, "A", "2019-01-01", "2019-06-01", false), // closed
      (1L, 11.0, "A2", "2019-06-01", null, true),         // new version
      (2L, 20.0, "B", "2019-01-01", null, true),          // untouched
      (3L, 30.0, "C", "2019-01-01", null, true),          // no-op delta
      (4L, 40.0, "D", "2018-01-01", "2019-01-01", false), // history
      (9L, 90.0, "Z", "2019-06-01", null, true)))         // insert
  }

  test("q36: SCD2 invariants — one current row per key, versions do not overlap") {
    import org.apache.spark.sql.functions._
    val out = Relational.q36Scd2(spark, sf).cache()
    try {
      // every key has exactly one current row
      val badCur = out.groupBy(col("c_custkey"))
        .agg(sum(when(col("is_current"), 1).otherwise(0)).as("n"))
        .filter(col("n") =!= 1).count()
      assert(badCur == 0, s"$badCur keys without exactly one current row")
      // closed rows end exactly where their successor starts
      val closed = out.filter(!col("is_current"))
        .select(col("c_custkey"), col("valid_to"))
      val opened = out.filter(col("is_current") && col("valid_from") === "2019-06-01")
        .select(col("c_custkey").as("k2"), col("valid_from"))
      val mismatch = closed.join(opened, col("c_custkey") === col("k2"))
        .filter(col("valid_to") =!= col("valid_from")).count()
      assert(mismatch == 0)
      // planted no-ops (k % 21 == 3) must NOT version
      val phantom = out.filter(col("c_custkey") % 21 === 3 && !col("is_current"))
        .count()
      assert(phantom == 0, s"$phantom phantom versions for no-op deltas")
      // inserts exist and carry no history
      assert(out.filter(col("c_custkey") > 1000000L).count() > 0)
      assert(out.filter(col("c_custkey") > 1000000L && !col("is_current"))
        .count() == 0)
    } finally out.unpersist()
  }

  test("q42 plan: Catalyst injects a runtime bloom filter on the probe side") {
    val sf = "/root/testdata/sf0.001"
    val df = Relational.q42Plan(Relational.q42Session(spark), sf)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"),
      s"no runtime bloom filter injected:\n${plan.take(4000)}")
    // and the filter sits on the LINEITEM (probe) side, fed by a
    // bloom_filter_agg built over the filtered orders keys
    assert(plan.contains("bloom_filter_agg"),
      s"no bloom filter aggregate on the creation side:\n${plan.take(4000)}")
  }

  test("q62: exact percentiles obey p25 <= p50 <= p75 and median == p50") {
    val rows = Relational.q62Percentiles(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p25, p50, p75) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(p25 <= p50 && p50 <= p75, s"percentiles out of order: $r")
      assert(r.getDouble(5) == p50, s"median != percentile_cont(0.5): $r")
      // quarter-point interpolation over integer quantities is an
      // exact multiple of 0.25 — the cross-engine-exactness argument
      assert(p25 * 4 == math.rint(p25 * 4), s"p25 not a quarter: $r")
    }
  }

  test("q63: sufficient statistics fold partially before the exchange") {
    val plan = physicalPlan(Relational.q63RegrStats(spark, sf))
    assert(plan.contains("partial_"), s"no partial aggregation in:\n$plan")
    // and the derived slope/r2 agree with the textbook identities
    val r = Relational.q63RegrStats(spark, sf).collect().head
    val (n, sx, sy, sxy, sxx) =
      (r.getLong(1).toDouble, r.getLong(2).toDouble, r.getLong(3).toDouble,
        r.getLong(4).toDouble, r.getLong(5).toDouble)
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(r.getDouble(7) == slope, "slope != mirrored IEEE tree")
    assert(r.getDouble(10) >= -1.0 && r.getDouble(10) <= 1.0, "corr out of range")
  }

  test("q64: bit/bool aggregates fold partially and stay integer-exact") {
    val plan = physicalPlan(Relational.q64BitBoolAgg(spark, sf))
    assert(plan.contains("partial_"), s"no partial aggregation in:\n$plan")
    val r = Relational.q64BitBoolAgg(spark, sf).collect()
    r.foreach { row =>
      val (band, bor) = (row.getLong(1), row.getLong(2))
      assert((band & bor) == band, s"bit_and must be a submask of bit_or: $row")
    }
  }

  test("q65: try_divide nulls exactly the %7==0 rows, never aborts") {
    val rows = Relational.q65TryArith(spark, sf).collect()
    val nRows = rows.map(_.getLong(1)).sum
    val nNull = rows.map(_.getLong(2)).sum
    assert(nNull > 0 && nNull < nRows, s"divide-by-zero population degenerate")
    // OOB element_at and non-numeric casts are all-null populations
    assert(rows.forall(_.getLong(5) == 0L), "status letters must not cast")
    assert(rows.forall(_.getLong(6) == 0L), "OOB index must be null")
  }

  test("q66: unionByName binds by name and null-fills missing columns") {
    val rows = Relational.q66UnionByName(spark, sf).collect()
    val v1 = rows.filter(r => !r.isNullAt(0) && r.getString(0) == "v1")
    val v2 = rows.filter(_.isNullAt(0))
    assert(v1.nonEmpty && v2.nonEmpty)
    // v1 branch carries prices and no statuses; v2 the inverse — a
    // positional union would scramble exactly this
    assert(v1.forall(r => r.getLong(3) == r.getLong(2) && r.getLong(4) == 0L))
    assert(v2.forall(r => r.getLong(3) == 0L && r.getLong(4) == r.getLong(2)))
    // union is plan concatenation: no exchange below the aggregate
    val plan = physicalPlan(Relational.q66UnionByName(spark, sf))
    assert(plan.contains("Union"), s"no union in plan:\n$plan")
  }

  test("q67: the window frame is a value-driven RANGE over the interval") {
    val df = Relational.q67TimeRangeFrame(spark, sf)
    val plan = physicalPlan(df)
    assert(plan.contains("RangeFrame") && plan.contains("INTERVAL"),
      s"no interval range frame in plan:\n$plan")
    // frame sums are monotone-bounded by the partition totals
    val rows = df.collect()
    assert(rows.forall(_.getLong(3) >= 1), "frame must include CURRENT ROW")
    val perUser = rows.groupBy(_.getLong(0))
    perUser.values.foreach { g =>
      assert(g.map(_.getLong(3)).max <= g.length,
        "frame count exceeds partition size")
    }
  }

  test("q68: empty days surface as zeros; the daily aggregate broadcasts") {
    val df = Relational.q68DateSpine(spark, sf)
    val plan = physicalPlan(df)
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftOuter"),
      s"spine join must broadcast the daily aggregate:\n$plan")
    val rows = df.collect()
    // the spine is dense: every (day, priority) pair within bounds
    val days = rows.map(_.getDate(0).toString).distinct.length
    assert(rows.length == days * 5, s"spine not dense: ${rows.length} vs $days x 5")
    assert(rows.exists(_.getLong(2) == 0L),
      "no zero day at this SF — the left join is untested (pick a denser spine)")
  }

  test("semi/anti join row counts are consistent with their complement") {
    val customers = graft.Tables(spark, sf, "customer").count()
    val semi = Relational.q04SemiJoin(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_customers")).head().getLong(0)
    val anti = Relational.q05AntiJoin(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_customers")).head().getLong(0)
    assert(semi + anti == customers)
  }

  test("q71: channel credits reconcile to the cent with total purchase value") {
    import org.apache.spark.sql.functions._
    val out = Relational.q71Attribution(spark, sf).collect()
    val credited = out.map(_.getLong(2)).sum
    val totalCents = graft.Tables(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .agg(sum(round(col("value") * 100).cast("long"))).head().getLong(0)
    assert(credited == totalCents,
      s"attribution leaked money: credited $credited of $totalCents cents")
    assert(out.map(_.getString(0)).toSeq == out.map(_.getString(0)).toSeq.sorted)
  }

  test("q72: vwap lies within [min, max] price per part and weights reconcile") {
    import org.apache.spark.sql.functions._
    val li = graft.Tables(spark, sf, "lineitem")
      .select(col("l_partkey"), round(col("l_extendedprice") * 100).cast("long").as("c"))
    val bounds = li.groupBy("l_partkey")
      .agg(min(col("c")).as("mn"), max(col("c")).as("mx"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rows = Relational.q72Vwap(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mn, mx) = bounds(r.getLong(0))
      val vwapE4 = r.getLong(2)
      // truncated e4 vwap sits within the e4-scaled per-part price range
      assert(vwapE4 >= mn * 100 - 1 && vwapE4 <= mx * 100,
        s"part ${r.getLong(0)}: vwap_e4 $vwapE4 outside [$mn, $mx] cents")
    }
  }

  test("q74: 20 buckets cover all rows, ranges nest, extremes hit ends") {
    val rows = Relational.q74Histogram(spark, sf).collect()
    val buckets = rows.map(_.getLong(0))
    assert(buckets.forall(b => b >= 0 && b <= 19))
    assert(buckets.head == 0L && buckets.last == 19L,
      "min must land in bucket 0 and max in bucket 19")
    val total = rows.map(_.getLong(1)).sum
    val liRows = graft.Tables(spark, sf, "lineitem").count()
    assert(total == liRows, s"histogram covers $total of $liRows rows")
    // per-bucket [min,max] ranges must not overlap across buckets
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) < b.getLong(2),
        s"bucket ${a.getLong(0)} max >= bucket ${b.getLong(0)} min")
    case _ => ()
    }
  }

  test("q69: CM estimates never undercount and the overcount column agrees") {
    val rows = Relational.q69CmsSketch(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"undercount at key ${r.getLong(0)}")
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1))
    }
  }
}
