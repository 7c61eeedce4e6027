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

  private val worstResults =
    SparkEntry.queries.keys.toSeq.sorted.map(_ -> Double.MaxValue)

  test("worst-case bench stdout line fits the driver's 2000-char tail window") {
    // worst-case rendering: stdout values clamp at "9999" (4 chars) in
    // Bench.stdoutLine, so Double.MaxValue budgets the TRUE worst case
    // — no value, however pathological, can widen an entry past the
    // asserted line (earlier rounds budgeted with 999.94, which a
    // >=9999.5 s query would have exceeded at 5+ chars per entry)
    val line = Bench.stdoutLine(worstResults, Map.empty, "/root/testdata/sf0.1")
    // BENCH_r03 measured the tail window at exactly 2000 chars; the
    // only trailing output is the final newline (sbt showSuccess is
    // disabled, Spark logs go to stderr) — keep a 40-char margin.
    // At the margin: keep NEW query keys short (<= 12 chars) or trim
    // the stdout format again before registering more queries.
    assert(line.length <= 1960,
      s"bench stdout line worst-case ${line.length} chars > 1960: " +
        "shorten per-query keys or trim the stdout format further")
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
    // same 1960 bound as the passing-run test: the 40-char margin for
    // the trailing newline applies equally here
    assert(line.length <= 1960,
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
