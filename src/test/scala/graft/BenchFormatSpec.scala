package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the size of Bench's one-line stdout JSON: the driver locates
  * and parses it within the LAST 2000 characters of captured output
  * (BENCH_r02 parsed at 1918 chars; BENCH_r03's 68-query full-precision
  * line at ~2.6k did not). Round 6's format decision: full registry
  * names outgrew the window at 93 queries, so stdout keys now shorten
  * to their family prefix ("d11_semdedup" -> "d11" — unique across the
  * registry) while the file artifact keeps full names and precision.
  * Every assertion goes through Bench's REAL stdout builder so format
  * drift can't silently invalidate it.
  */
class BenchFormatSpec extends AnyFunSuite {

  // Two worst cases, both asserted: 9.9 renders "9.9" — the WIDEST any
  // per-query value can be (3 chars) — while a pathological all-huge
  // run clamps per-query values to "99" (2 chars) but pushes the
  // TOTAL to its own 4-char "9999" clamp (the round-5 ADVICE gap: a
  // >= 9999.5 s total is 1 char wider than the 9.9-per-query case's
  // total, so budgeting only the latter understated it).
  private val worstResults =
    SparkEntry.queries.keys.toSeq.sorted.map(_ -> 9.9)
  private val hugeResults =
    SparkEntry.queries.keys.toSeq.sorted.map(_ -> 1e9)

  test("worst-case bench stdout line fits the driver's 2000-char tail window") {
    val lines = Seq(worstResults, hugeResults)
      .map(r => Bench.stdoutLine(r, Map.empty, "/root/testdata/sf0.1"))
    // 1999 is the hard ceiling (line + trailing newline inside the
    // measured 2000-char tail); a 14-char margin covers slack. With
    // prefix keys the budget has ~900 chars of headroom again —
    // registering more queries is cheap until prefixes collide.
    for (line <- lines)
      assert(line.length <= 1985,
        s"bench stdout line worst-case ${line.length} chars > 1985: " +
          "shorten the stdout format further (file artifact is unaffected)")
  }

  test("budget admission drops only the fastest queries and counts them as n_fast") {
    // realistic shape: every value renders 3 chars ("0.1".."9.9"), so
    // at 197 queries a handful of entries MUST fold into n_fast — the
    // admitted set must be exactly the slowest ones
    val mixed = SparkEntry.queries.keys.toSeq.sorted.zipWithIndex
      .map { case (k, i) => k -> (if (i % 3 == 0) 5.0 + (i % 50) * 0.1 else 0.1) }
    val line = Bench.stdoutLine(mixed, Map.empty, "/root/testdata/sf0.1")
    assert(line.length <= 1985, s"${line.length} > 1985")
    val nFast = """"n_fast":(\d+)""".r.findFirstMatchIn(line).map(_.group(1).toInt)
    // every slow (>= 5s) query must be present; only 0.1s entries fold
    val slow = mixed.filter(_._2 >= 5.0).map(_._1)
    slow.foreach { k =>
      val short = k.takeWhile(_ != '_')
      assert(line.contains(s"\"$short\":"), s"slow query $k omitted from stdout")
    }
    nFast.foreach { n =>
      assert(n > 0 && n < mixed.size / 2, s"n_fast=$n out of range")
    }
    // a small registry is never truncated and never emits n_fast
    val small = Bench.stdoutLine(Seq("a_x" -> 0.1, "b_y" -> 3.0), Map.empty, "sf")
    assert(!small.contains("n_fast") && small.contains("\"a\":0.1"), small)
  }

  test("stdout keys shorten to the unique family prefix") {
    val line = Bench.stdoutLine(
      Seq("d11_semdedup" -> 3.2, "q01_pricing_summary" -> 0.4), Map.empty, "sf")
    assert(line.contains("\"d11\":3.2"), line)
    assert(line.contains("\"q01\":0.4"), line)
  }

  test("a colliding prefix falls back to full names on both colliders") {
    val line = Bench.stdoutLine(
      Seq("qx_one" -> 1.0, "qx_two" -> 2.0, "zz_solo" -> 3.0), Map.empty, "sf")
    assert(line.contains("\"qx_one\":1.0") && line.contains("\"qx_two\":2.0"), line)
    assert(line.contains("\"zz\":3.0"), line)
  }

  test("registry prefixes are collision-free (so the driver sees short keys)") {
    val prefixes = SparkEntry.queries.keys.toSeq.map(_.takeWhile(_ != '_'))
    val dupes = prefixes.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty,
      s"registry keys share prefixes $dupes — their stdout entries fall " +
        "back to full names, eroding the line budget; rename deliberately")
  }

  test("per-query values render at most 3 chars for ANY input") {
    // the width bound the line budget above relies on — checked
    // through the real builder across the format's branch points
    for (v <- Seq(0.0, 0.04, 9.9, 9.94999, 9.95, 10.0, 98.4, 98.5,
        99.9, 100.0, 1e9, Double.MaxValue)) {
      val line = Bench.stdoutLine(Seq("q" -> v), Map.empty, "sf")
      val rendered = """"q":([^,}]*)""".r.findFirstMatchIn(line).get.group(1)
      assert(rendered.length <= 3, s"value $v rendered '$rendered' > 3 chars")
    }
  }

  test("the line stays inside the window on FAILING runs too (count-only errors)") {
    // the failing-run case is exactly when the consumer must still be
    // able to parse the line — stdout errors carry only a count (full
    // messages go to the file artifact and stderr, exit is nonzero),
    // so even every-query-failed-with-a-long-message stays inside the
    // measured 2000-char window
    val allFailed = worstResults
      .map { case (k, _) => k -> ("SparkException: " + "x" * 400) }.toMap
    val line = Bench.stdoutLine(worstResults, allFailed, "/root/testdata/sf0.1")
    // same 1985 bound as the passing-run test: the margin for the
    // trailing newline applies equally here (failing runs render
    // whole-second values, which pays for the errors section)
    assert(line.length <= 1985,
      s"failing-run stdout line ${line.length} chars overflows the window")
    assert(line.contains(s""""n_failed":${allFailed.size}"""),
      "failure count missing")
  }

  test("stdout values render with a decimal point regardless of JVM locale") {
    // through the real builder: a locale-sensitive formatter would
    // render '3,1' on comma-decimal locales — invalid JSON
    val line = Bench.stdoutLine(Seq("q" -> 3.14159), Map.empty, "sf")
    assert(line.contains("\"q\":3.1"), line)
  }
}
