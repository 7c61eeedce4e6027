package graft.ops

import graft.SparkSuiteBase
import org.apache.spark.sql.functions._

/** The c01 composition: stage semantics the oracle can't see (gating
  * monotonicity, quota bound) plus the plan property that makes the
  * chain scale — the text column never crosses an exchange. */
class CurationSpec extends SparkSuiteBase {
  private val sf = "/root/testdata/sf0.001"

  test("c01: quota bound holds and the report covers only gated docs") {
    val out = Curation.c01Curation(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(1) <= 50), "per-source quota violated")
    val kept = out.map(_.getLong(1)).sum
    val en = graft.Tables(spark, sf, "documents")
      .filter(col("lang") === "en").count()
    assert(kept <= en, s"kept $kept docs out of $en english")
  }

  test("c01 plan: no exchange carries the raw text column") {
    val plan = Curation.c01Curation(spark, sf)
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty, s"expected shuffles in:\n$plan")
    assert(!exchanges.exists(_.contains("text#")),
      s"an exchange ships document text:\n${exchanges.mkString("\n")}")
  }

  test("c02: sample respects the budget; packs respect greedy-fill invariants") {
    val out = Curation.c02Assembly(spark, sf).collect()
    assert(out.nonEmpty)
    val nDocs = out.map(_.getLong(2)).sum
    assert(nDocs <= 128, s"sampled $nDocs docs past the budget")
    // greedy contiguous fill: within a shard, bins are dense from 0,
    // and a bin only exceeds capacity via a doc spilling OVER a
    // boundary — so every non-final bin of a shard must hold >= 256
    // cumulative... the sharp invariant is per-bin: a bin with >= 2
    // docs started below capacity, so its tokens-before-last < 256;
    // the cheap universal check is bin token sums bounded by
    // capacity + max single doc length
    val maxDoc = graft.Tables(spark, sf, "documents")
      .select(size(TextDedup.tokens(col("text"))).cast("long").as("n"))
      .agg(max(col("n"))).head().getLong(0)
    assert(out.forall(r => r.getLong(3) <= 256 + maxDoc),
      "a pack exceeds capacity plus one spill doc")
    out.groupBy(_.getLong(0)).foreach { case (shard, rows) =>
      checkBins(shard, rows, maxDoc)
    }
  }

  private def checkBins(shard: Long,
      rows: Array[org.apache.spark.sql.Row], maxDoc: Long): Unit = {
    val bins = rows.map(_.getLong(1)).sorted
    assert(bins.head == 0, s"shard $shard bins start at ${bins.head}")
    // a single doc can span floor(maxDoc/256) bin boundaries, so
    // consecutive occupied bins may gap by at most that + 1
    val maxGap = maxDoc / 256 + 1
    assert(bins.zip(bins.tail).forall { case (a, b) => b - a <= maxGap },
      s"shard $shard bin gap exceeds one spilled doc: ${bins.mkString(",")}")
  }

  test("c03: manifest counts match the tables; checksum moves on any membership change") {
    val out = Curation.c03Manifest(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.size == 10)
    assert(out("region")._2 == graft.Tables(spark, sf, "region").count())
    assert(out("documents")._2 == graft.Tables(spark, sf, "documents").count())
    assert(out("lineitem")._1 == 11) // column counts pinned
    // membership sensitivity: dropping one row must flip the checksum
    // (recompute the same 48-bit-prefix XOR fold locally)
    val ids = graft.Tables(spark, sf, "region")
      .select(col("r_regionkey").cast("string")).collect().map(_.getString(0))
    def xor48(ks: Seq[String]): Long = ks.map { k =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(k.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(6).map(b => f"${b & 0xff}%02x").mkString, 16)
    }.reduce(_ ^ _)
    assert(xor48(ids.toSeq) == out("region")._3, "local 48-bit xor mismatch")
    assert(xor48(ids.toSeq.drop(1)) != out("region")._3)
  }

  test("c07: flags exactly the days violating the integer 2-sigma inequality") {
    val out = Curation.c07AnomalyDays(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getBoolean(2)))
    assert(out.nonEmpty)
    // independent driver-side replay over the emitted daily counts
    val cnts = out.map(_._2)
    val (n, s2, sq) = (BigInt(cnts.length), BigInt(cnts.sum),
      cnts.map(c => BigInt(c) * BigInt(c)).sum)
    out.foreach { case (day, c, flagged) =>
      val dev = n * BigInt(c) - s2
      val want = dev * dev > 4 * (n * sq - s2 * s2)
      assert(flagged == want, s"$day: engine $flagged, replay $want")
    }
    // the synthetic stream's partial boundary days must trip the wire
    assert(out.exists(_._3), "no anomaly flagged — tripwire is dead")
    assert(out.count(_._3) < out.length, "every day flagged — test is vacuous")
  }
}
