package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the size of Bench's one-line stdout JSON: the driver locates
  * and parses it within the LAST 2000 characters of captured output
  * (BENCH_r02 parsed at 1918 chars; BENCH_r03's 68-query full-precision
  * line at ~2.6k did not). The stdout line uses %.1f values and a
  * bounded errors section, so its length is bounded by the registered
  * query names plus a fixed per-entry cost — this spec fails the build
  * when registering more queries would push a worst-case line past the
  * window, forcing a deliberate format decision instead of a silent
  * driver parse failure. Every assertion goes through Bench's REAL
  * stdout builder so format drift can't silently invalidate it.
  */
class BenchFormatSpec extends AnyFunSuite {

  // 9.9 renders "9.9" — the WIDEST any per-query value can be (3
  // chars): below 10 s one decimal, 10-98 whole seconds (2 chars),
  // clamp "99" above. A Double.MaxValue budget would hit the 2-char
  // clamp and UNDERstate the worst case by a char per entry.
  private val worstResults =
    SparkEntry.queries.keys.toSeq.sorted.map(_ -> 9.9)

  test("worst-case bench stdout line fits the driver's 2000-char tail window") {
    val line = Bench.stdoutLine(worstResults, Map.empty, "/root/testdata/sf0.1")
    // BENCH_r03 measured the tail window at exactly 2000 chars, and
    // every round's captured tail has ended at exactly our line + one
    // trailing newline (Spark logs go to stderr, sbt showSuccess is
    // disabled) — so 1999 is the hard ceiling and a 14-char margin
    // covers the newline with slack. At the margin: the format is out
    // of cheap trims (3-char values, count-only errors, basename sf)
    // — registering more queries means renaming keys or dropping the
    // per-query map from stdout. Decide deliberately.
    assert(line.length <= 1985,
      s"bench stdout line worst-case ${line.length} chars > 1985: " +
        "shorten per-query keys or trim the stdout format further")
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
