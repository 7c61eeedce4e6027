package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the size of Bench's one-line stdout JSON: the driver locates
  * and parses it within the LAST 2000 characters of captured output
  * (BENCH_r02 parsed at 1918 chars; BENCH_r03's 68-query full-precision
  * line at ~2.6k did not). The stdout line uses %.2f values, so its
  * length is bounded by the registered query names plus a fixed
  * per-entry cost — this spec fails the build when registering more
  * queries would push a worst-case line past the window, forcing a
  * deliberate format decision instead of a silent driver parse failure.
  */
class BenchFormatSpec extends AnyFunSuite {

  test("worst-case bench stdout line fits the driver's 2000-char tail window") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    // worst-case realistic value rendering under %.2f: "999.99" (a
    // 1000s single query would mean a far bigger problem than parsing)
    val entry = names.map(n => s""""$n":999.99""").mkString(",")
    val line =
      s"""{"metric":"total","value":99999.99,"unit":"sec","queries":{$entry},"errors":{},"sf":"/root/testdata/sf0.1"}"""
    // 100-char margin for stray trailing output (sbt showSuccess is
    // disabled, but keep headroom for e.g. a final WARN line)
    assert(line.length <= 1900,
      s"bench stdout line worst-case ${line.length} chars > 1900: " +
        "shorten per-query keys or drop to 1-decimal values")
  }

  test("%.2f with Locale.ROOT renders a decimal point regardless of JVM locale") {
    val v = String.format(java.util.Locale.ROOT, "%.2f", Double.box(3.14159))
    assert(v == "3.14")
  }
}
