package graft.ops

import graft.SparkSuiteBase
import org.apache.spark.sql.functions._

/** Layout must never change answers: the bucketed / partitioned copies
  * q30/q31 read are byte-equivalent reorderings of the source tables,
  * so each query must equal the same computation over the originals.
  * (The plan-side claims — zero exchange, partition pruning — live in
  * PlanAuditSpec; the oracle gate re-proves these value checks against
  * DuckDB at sf0.01.) */
class LayoutSpec extends SparkSuiteBase {
  private val sf = "/root/testdata/sf0.001"

  test("q30 equals the same aggregate over the unbucketed tables") {
    val got = Layout.q30BucketedJoin(spark, sf).collect()
    val want = graft.Tables(spark, sf, "lineitem")
      .join(graft.Tables(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy(col("o_orderpriority"))
      .collect()
    assert(got.toSeq == want.toSeq)
  }

  test("bucketed layout write happens once per session and dir") {
    val (lT, _) = Layout.bucketedTables(spark, sf)
    val loc = spark.sql(s"DESCRIBE TABLE EXTENDED $lT")
      .filter(col("col_name") === "Location").head.getString(1)
      .stripPrefix("file:")
    val before = new java.io.File(loc).listFiles().map(_.lastModified).max
    Layout.bucketedTables(spark, sf)
    val after = new java.io.File(loc).listFiles().map(_.lastModified).max
    assert(before == after, "second call rewrote the bucketed layout")
  }

  test("q33 equals the same aggregate over the parquet orders") {
    val got = Layout.q33JsonRoundtrip(spark, sf).collect()
    val orders = graft.Tables(spark, sf, "orders")
    val want = orders
      .filter(col("o_orderdate") >=
        lit("1996-06-15").cast(orders.schema("o_orderdate").dataType))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("sum_price"))
      .orderBy(col("o_orderstatus"))
      .collect()
    assert(got.toSeq == want.toSeq)
  }

  test("q34 equals the same aggregate over the parquet customer — corrupt row excluded") {
    val got = Layout.q34CsvPermissive(spark, sf).collect()
    val want = graft.Tables(spark, sf, "customer")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"),
        round(sum(col("c_acctbal")), 2).as("sum_bal"),
        min(col("c_custkey")).as("min_key"))
      .orderBy(col("c_mktsegment"))
      .collect()
    assert(got.toSeq == want.toSeq)
  }

  test("q35: merged read surfaces nulls for the pre-schema generation, loses nothing") {
    val got = Layout.q35SchemaEvolution(spark, sf).collect()
    val want = graft.Tables(spark, sf, "orders")
      .groupBy(when(col("o_orderkey") % 2 === 0, lit("<pre-schema>"))
        .otherwise(col("o_orderstatus")).as("status"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("sum_price"),
        min(col("o_orderkey")).as("min_key"))
      .orderBy(col("status"))
      .collect()
    assert(got.toSeq == want.toSeq)
    // and the merged schema actually contains the evolved column as
    // nullable for the old generation: pre-schema rows ARE null-status
    val root = Layout.ordersEvolved(spark, sf)
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$root/v1", s"$root/v2")
    val nullStatus = merged.filter(col("o_orderstatus").isNull)
      .agg(max(col("o_orderkey") % 2)).head.getLong(0)
    assert(nullStatus == 0L, "a post-schema row lost its status in the merge")
  }

  test("q37: compaction collapses 64 fragments to a handful of clustered files, loses nothing") {
    def parts(p: String): Array[java.io.File] =
      new java.io.File(p).listFiles()
        .filter(f => f.isFile && f.getName.startsWith("part-"))
    val frag = Layout.lineitemFragmented(spark, sf)
    val cpt = Layout.lineitemCompacted(spark, sf)
    assert(parts(frag).length >= 32,
      s"fragmented input should be many small files, got ${parts(frag).length}")
    assert(parts(cpt).length <= 8,
      s"compaction left ${parts(cpt).length} files")
    // content-exact: same row count and same checksum-ish aggregate
    val a = spark.read.parquet(frag)
      .agg(count(lit(1)), round(sum(col("l_extendedprice")), 2)).head
    val b = spark.read.parquet(cpt)
      .agg(count(lit(1)), round(sum(col("l_extendedprice")), 2)).head
    assert(a == b, s"compaction changed content: $a vs $b")
    // clustering took: each output file covers a narrow disjoint date
    // range — the per-file (min, max) intervals must not all span the
    // full corpus range (the fragmented files all do, by construction)
    import org.apache.spark.sql.functions.{input_file_name, max => fmax, min => fmin}
    val spans = spark.read.parquet(cpt)
      .groupBy(input_file_name().as("f"))
      .agg(fmin(col("l_shipdate").cast("timestamp").cast("long")).as("lo"),
        fmax(col("l_shipdate").cast("timestamp").cast("long")).as("hi"))
      .collect()
    assert(spans.length >= 2)
    val sorted = spans.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    sorted.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 <= lo2,
        s"range clustering violated: file ending $hi1 overlaps file starting $lo2")
    }
  }

  test("q37: date pushdown skips row groups on the compacted copy") {
    val plan = Layout.q37Scan(spark, Layout.lineitemCompacted(spark, sf))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(l_shipdate"),
      s"date predicate did not reach the compacted scan:\n$plan")
  }

  test("q43: BOTH federated branches keep their own pushdown across the format seam") {
    val plan = Layout.q43Plan(spark, sf, Layout.lineitemOrc(spark, sf))
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator
      .filter(l => l.contains("FileScan") || l.contains("BatchScan") ||
        l.contains("Scan parquet") || l.contains("Scan orc")).toSeq
    val pqScans = scans.filter(_.contains("parquet"))
    val orcScans = scans.filter(_.contains("orc"))
    assert(pqScans.nonEmpty && orcScans.nonEmpty,
      s"expected one scan per format:\n${scans.mkString("\n")}")
    // the quantity predicate must reach each branch's own reader
    assert(pqScans.exists(_.contains("GreaterThanOrEqual(l_quantity,30.0)")),
      s"quantity predicate missing from the parquet branch:\n${pqScans.mkString("\n")}")
    assert(orcScans.exists(_.contains("GreaterThanOrEqual(l_quantity,30.0)")),
      s"quantity predicate missing from the ORC branch:\n${orcScans.mkString("\n")}")
  }

  test("q46: morton interleave is exact; z-order narrows per-file spans in BOTH dims") {
    import spark.implicits._
    // bit-exact kernel check: x bits land at even positions, y at odd
    val m = Seq((1L, 0L), (0L, 1L), (3L, 0L), (0L, 3L), (3L, 3L), (5L, 6L))
      .toDF("x", "y")
      .select(Layout.morton(col("x"), col("y"), 16).as("z"))
      .as[Long].collect().toSeq
    assert(m == Seq(1L, 2L, 5L, 10L, 15L,
      // x=5(101) -> 1,0,1 at 0/2/4 = 17; y=6(110) -> 0,1,1 at 1/3/5 = 40
      57L), s"morton mismatch: $m")
    // layout property: every file's span shrinks vs the table's span
    // in BOTH dimensions (a 1-D sort leaves one dimension full-range)
    val z = Layout.lineitemZordered(spark, sf)
    import org.apache.spark.sql.functions.{input_file_name, max => fmax, min => fmin}
    val spans = spark.read.parquet(z)
      .groupBy(input_file_name().as("f"))
      .agg(fmin($"l_shipdate".cast("timestamp").cast("long")).as("dlo"),
        fmax($"l_shipdate".cast("timestamp").cast("long")).as("dhi"),
        fmin($"l_suppkey").as("slo"), fmax($"l_suppkey").as("shi"))
      .collect()
    assert(spans.length >= 3, s"expected >= 3 files, got ${spans.length}")
    val dSpan = spans.map(_.getLong(2)).max - spans.map(_.getLong(1)).min
    val sSpan = spans.map(_.getLong(4)).max - spans.map(_.getLong(3)).min
    // the z win is statistical: quantile boundaries can land
    // mid-quadrant and that file spans one dim widely (the curve
    // resets across the boundary) — but a MAJORITY of files must
    // narrow in EACH dimension, which no 1-D sort achieves (a date
    // sort narrows every file's date span and NO file's suppkey span)
    val dNarrow = spans.count(r => r.getLong(2) - r.getLong(1) <= 0.66 * dSpan)
    val sNarrow = spans.count(r => r.getLong(4) - r.getLong(3) <= 0.66 * sSpan)
    assert(dNarrow * 2 >= spans.length,
      s"only $dNarrow/${spans.length} files date-narrow (global $dSpan)")
    assert(sNarrow * 2 >= spans.length,
      s"only $sNarrow/${spans.length} files suppkey-narrow (global $sSpan)")
  }

  test("sweepStale removes orphaned copies of the same kind, keeps the live tag") {
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    val stale = new java.io.File(tmp, "graft_swtest_deadbeefdeadbeef")
    val live = new java.io.File(tmp, "graft_swtest_cafebabecafebabe")
    val other = new java.io.File(tmp, "graft_othertest_deadbeefdeadbeef")
    for (d <- Seq(stale, live, other)) {
      d.mkdirs()
      java.nio.file.Files.write(new java.io.File(d, "part-0").toPath,
        "x".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    try {
      Layout.sweepStale("swtest", "cafebabecafebabe")
      assert(!stale.exists(), "stale same-kind copy survived the sweep")
      assert(live.exists(), "the live tag's copy was swept")
      assert(other.exists(), "a different kind's copy was swept")
    } finally Seq(stale, live, other).foreach { d =>
      new java.io.File(d, "part-0").delete(); d.delete()
    }
  }

  test("sweepStaleFor scopes to one source dir: other sources' copies survive") {
    // sf0.001 tests and sf0.1 bench legitimately hold same-kind copies
    // side by side — the sweep must only remove stale GENERATIONS of
    // the source being rebuilt, never a different source's live copy
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    val srcA = java.nio.file.Files.createTempDirectory("graft_sweepA").toFile
    val srcB = java.nio.file.Files.createTempDirectory("graft_sweepB").toFile
    val staleA = new java.io.File(tmp,
      s"graft_swk2_${Layout.pathTag(srcA.getPath)}_0123456789abcdef")
    val liveA = new java.io.File(Layout.tmpPath("swk2", srcA.getPath))
    val liveB = new java.io.File(Layout.tmpPath("swk2", srcB.getPath))
    val legacy = new java.io.File(tmp, "graft_swk2_fedcba9876543210")
    val planted = Seq(staleA, liveA, liveB, legacy)
    planted.foreach { d =>
      d.mkdirs()
      java.nio.file.Files.write(new java.io.File(d, "part-0").toPath,
        "x".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    try {
      Layout.sweepStaleFor("swk2", srcA.getPath)
      assert(!staleA.exists(), "stale generation of source A survived")
      assert(liveA.exists(), "source A's live copy was swept")
      assert(liveB.exists(), "source B's copy was swept by A's rebuild")
      assert(!legacy.exists(), "legacy-named orphan survived")
    } finally (planted ++ Seq(srcA, srcB)).foreach { d =>
      new java.io.File(d, "part-0").delete(); d.delete()
    }
  }

  test("tag digests data files INSIDE a dataset-directory table") {
    // a table shipped as `name.parquet/` (Spark-written directory):
    // rewriting a part file in place must change the tag even though
    // the parent directory's own mtime does not move
    val src = java.nio.file.Files.createTempDirectory("graft_tagtest").toFile
    try {
      val tbl = new java.io.File(src, "t.parquet"); tbl.mkdirs()
      val part = new java.io.File(tbl, "part-00000.parquet")
      java.nio.file.Files.write(part.toPath, "v1".getBytes)
      val before = Layout.tag(src.getPath)
      java.nio.file.Files.write(part.toPath, "v2xx".getBytes) // new length
      val dirMtime = tbl.lastModified
      tbl.setLastModified(dirMtime): Unit // pin the parent dir stat
      assert(Layout.tag(src.getPath) != before,
        "in-place part rewrite did not change the layout tag")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      rm(src)
    }
  }

  test("q31 equals the same aggregate over the unpartitioned events") {
    val got = Layout.q31PartitionPruning(spark, sf).collect()
    val want = graft.Tables(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(pmod(col("user_id"), lit(20)).as("bucket"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("bucket"))
      .collect()
    assert(got.toSeq == want.toSeq)
  }
}
