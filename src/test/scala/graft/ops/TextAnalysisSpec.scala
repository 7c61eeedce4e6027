package graft.ops

import graft.SparkSuiteBase
import org.apache.spark.sql.functions._

/** Kernel-level tests for the text-analysis operators with PLANTED
  * structure (the harness corpus is random, so the oracle gate proves
  * value-parity but not the semantics these prove: a contaminated doc
  * is flagged, a repetitive doc scores high, clean docs score zero). */
class TextAnalysisSpec extends SparkSuiteBase {
  import spark.implicits._

  /** Write a documents-shaped table to a temp dir (the operator entry
    * points read the harness layout). */
  private def docsDir(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ta").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("t09: doc sharing an 8-gram with the benchmark slice is flagged, others are not") {
    val eval = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val dir = docsDir(Seq(
      107L -> eval,                                     // benchmark member (107 % 100 == 7)
      1L -> s"prefix words then $eval and a suffix",    // contains the full eval text -> contaminated
      2L -> "completely unrelated text about spark shuffles and parquet readers today ok",
      3L -> "alpha bravo charlie delta echo foxtrot golf different tail words here"
    ))                                                  // 7-gram overlap only -> NOT contaminated at k=8
    val got = TextAnalysis.t09Contamination(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(1L), s"expected only doc 1 flagged, got $got")
    // eval text has 10 tokens -> 3 distinct 8-grams, all inside doc 1
    assert(got(1L) == 3L)
  }

  test("t19: vocab/token totals exact, slope matches a hand-computed OLS fit") {
    // freq 3, 2, 1 over ranks 1, 2, 3 -> slope of ln f on ln r
    val dir = docsDir(Seq(1L -> "a a a b b c"))
    val (nv, nt, slope, nTop) = TextAnalysis.t19Zipf(spark, dir)
      .as[(Long, Long, Double, Long)].collect().head
    assert((nv, nt, nTop) == ((3L, 6L, 3L)))
    val xs = Seq(1.0, 2.0, 3.0).map(math.log)
    val ys = Seq(3.0, 2.0, 1.0).map(math.log)
    val mx = xs.sum / 3; val my = ys.sum / 3
    val expected = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum /
      xs.map(x => (x - mx) * (x - mx)).sum
    assert(math.abs(slope - math.rint(expected * 10000) / 10000) <= 1e-4,
      s"slope $slope vs expected $expected")
  }

  test("t18: bigram counts, conditioning denominators, and cond_p on a known corpus") {
    val dir = docsDir(Seq(
      1L -> "a b a b", // bigrams: "a b", "b a", "a b"
      2L -> "a b c",   // bigrams: "a b", "b c"
      3L -> "solo"     // 1 token -> no bigrams
    ))
    val got = TextAnalysis.t18BigramLm(spark, dir)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // c("a b")=3, c("b a")=1, c("b c")=1; c_w1: a->3, b->2
    assert(got == Map(
      "a b" -> ((3L, 3L, 1.0)),
      "b a" -> ((1L, 2L, 0.5)),
      "b c" -> ((1L, 2L, 0.5))))
  }

  test("t10: repetitive doc scores high, all-distinct doc scores zero, short doc is safe") {
    val dir = docsDir(Seq(
      1L -> "spam spam spam spam spam spam spam spam spam spam", // 8 identical 3-grams
      2L -> "one two three four five six seven eight nine ten",  // all distinct
      3L -> "ab cd"                                              // < 3 tokens -> no grams
    ))
    val got = TextAnalysis.t10RepetitionRatio(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((8L, 1L, 0.875)))
    assert(got(2L) == ((8L, 8L, 0.0)))
    assert(got(3L) == ((0L, 0L, 0.0)))
  }

  test("t11: greedy fill crosses bin boundary on cumulative tokens, shards pack independently") {
    val w300 = Seq.fill(300)("tok").mkString(" ") // 300 tokens
    val dir = docsDir(Seq(0L -> w300, 32L -> w300, 64L -> w300, 1L -> w300))
    val got = TextAnalysis.t11SequencePack(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // shard 0: cum_before = 0, 300, 600 -> bins 0, 0, 1 (capacity 512)
    assert(got(0L) == ((0L, 300L, 0L)))
    assert(got(32L) == ((0L, 300L, 0L)))
    assert(got(64L) == ((0L, 300L, 1L)))
    // shard 1 packs from zero, unaffected by shard 0's fill level
    assert(got(1L) == ((1L, 300L, 0L)))
  }

  test("t12: rule precedence — short beats repetitive, boundary docs keep") {
    val spam11 = Seq.fill(11)("spam").mkString(" ")  // 11 tokens, dup_ratio 8/9 > 0.2
    val spam5 = Seq.fill(5)("spam").mkString(" ")    // < 10 tokens AND repetitive
    val clean10 = (1 to 10).map(i => s"w$i").mkString(" ") // exactly 10 -> keep
    val dir = docsDir(Seq(1L -> spam11, 2L -> spam5, 3L -> clean10))
    val got = TextAnalysis.t12QualityFilter(spark, dir)
      .as[(Long, Long, String, Boolean)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    assert(got(1L) == (("repetitive", false)))
    assert(got(2L) == (("too_short", false))) // precedence: short wins over repetitive
    assert(got(3L) == (("keep", true)))
  }

  test("t09 plan: AQE broadcasts the small benchmark side at runtime (no forced hint)") {
    val dir = docsDir(Seq(107L -> "a b c d e f g h i", 1L -> "a b c d e f g h i j"))
    val df = TextAnalysis.t09Contamination(spark, dir)
    df.collect() // materialize so AQE finalizes the join strategy
    // the FINAL adaptive plan must broadcast; there is deliberately no
    // broadcast() hint in the query (a forced broadcast could not be
    // demoted when the benchmark side scales with the corpus)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"AQE should broadcast the tiny benchmark gram set:\n$plan")
  }

  /** documents dir with controlled languages (docsDir pins lang=en). */
  private def langDocsDir(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ta").toString
    rows.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("t13: per-lang quota respected, sample deterministic, independent of t08's split hash") {
    val rows = (0L until 60L).map(i =>
      (i, s"doc number $i", if (i % 3 == 0) "en" else "de"))
    val dir = langDocsDir(rows)
    val got = TextAnalysis.t13Stratified(spark, dir)
      .as[(Long, String, Long)].collect()
    // quota is 20 per lang: en has 20 members (all kept), de has 40 (20 kept)
    val byLang = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang == Map("en" -> 20, "de" -> 20), s"got $byLang")
    assert(got.forall(_._3 <= 20))
    // deterministic: same input -> same sample
    val again = TextAnalysis.t13Stratified(spark, dir)
      .as[(Long, String, Long)].collect()
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // the salt decorrelates from t08's md5(doc_id) split: the de sample
    // must not simply be the 20 smallest md5(doc_id) values
    val deIds = rows.filter(_._3 == "de").map(_._1)
    val t08Order = deIds.sortBy(i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes).map("%02x".format(_)).mkString).take(20).toSet
    val deSample = got.filter(_._2 == "de").map(_._1).toSet
    assert(deSample != t08Order,
      "stratified sample must use a different hash order than the split bucket")
  }

  test("t13 plan: WindowGroupLimit prunes to the quota on both sides of the exchange") {
    val dir = langDocsDir((0L until 50L).map(i => (i, "x", "en")))
    val plan = TextAnalysis.t13Stratified(spark, dir)
      .queryExecution.executedPlan.toString
    assert("WindowGroupLimit".r.findAllIn(plan).size >= 2,
      s"expected map- and reduce-side WindowGroupLimit:\n$plan")
  }

  test("t14: BM25 ranks by term frequency and penalizes document length") {
    val filler = (1 to 40).map(i => s"filler$i").mkString(" ")
    val dir = docsDir(Seq(
      1L -> "spark spark spark window batch and some other words here",
      2L -> "spark appears once in this doc of comparable length overall",
      3L -> s"spark appears once but this document is much longer $filler",
      4L -> "no query terms at all in this one just noise words"))
    val got = TextAnalysis.t14Bm25(spark, dir)
      .as[(Long, Double)].collect().toMap
    assert(!got.contains(4L), "doc without any query term must not score")
    assert(got(1L) > got(2L), "higher tf must outrank")
    assert(got(2L) > got(3L), "same tf, shorter doc must outrank (length norm)")
  }

  test("t17: planted and inline URLs aggregate per domain with url and doc counts") {
    val dir = docsDir(Seq(
      0L -> "plain words",                                  // %4 and %6: site0 + cdn
      3L -> "check https://inline.example.com/x now",       // inline URL only
      4L -> "more words",                                   // %4: site4
      6L -> "and more",                                     // %6: cdn
      7L -> "nothing here"))
    val got = TextAnalysis.t17Domains(spark, dir)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      "cdn.example.net" -> ((2L, 2L)),
      "inline.example.com" -> ((1L, 1L)),
      "site0.example.org" -> ((1L, 1L)),
      "site4.example.org" -> ((1L, 1L))), s"got $got")
  }

  test("t16: rare tokens raise the unigram NLL; values are the exact corpus-model means") {
    val dir = docsDir(Seq(
      1L -> "a a a a",      // all common: nll = -ln(7/8)
      2L -> "a a a rare"))  // one rare token: (3*-ln(7/8) + -ln(1/8)) / 4
    val got = TextAnalysis.t16UnigramNll(spark, dir)
      .as[(Long, Long, Double, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((4L, 0.1335, "head")), s"got ${got(1L)}")
    assert(got(2L) == ((4L, 0.62, "head")), s"got ${got(2L)}")
  }

  test("t30: growth curve is monotone and its last row equals the corpus totals") {
    val sf = "/root/testdata/sf0.001"
    val rows = TextAnalysis.t30Heaps(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows.map(_._1) == (1L to rows.size))
    // cumulative curves never decrease, vocab grows sublinearly vs
    // tokens past the first prefix (Heaps: repeated tokens accumulate)
    rows.sliding(2).foreach { case Seq(a, b) =>
      assert(a._2 <= b._2 && a._3 <= b._3 && a._4 <= b._4, s"$a !<= $b")
    }
    val docs = graft.Tables(spark, sf, "documents").filter($"text".isNotNull)
    val nDocs = docs.count()
    val totals = docs
      .select(explode(TextDedup.tokens($"text")).as("w"))
      .agg(count(lit(1)), countDistinct($"w")).head()
    assert(rows.last._2 == nDocs)
    assert(rows.last._3 == totals.getLong(0))
    assert(rows.last._4 == totals.getLong(1))
  }

  test("t15: planted and pre-existing PII both redact; clean docs pass through verbatim") {
    val dir = docsDir(Seq(
      0L -> "plain words here",                       // %3 and %5: email + phone planted
      1L -> "reach me at bob.smith@x.co for details", // pre-existing email, nothing planted
      2L -> "no pii in this one",
      3L -> "another plain doc",                      // %3: email planted
      5L -> "fifth doc text"))                        // %5: phone planted
    val got = TextAnalysis.t15Pii(spark, dir)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(0L)._1 == 1L && got(0L)._2 == 1L)
    assert(!got(0L)._3.contains("@") && !got(0L)._3.contains("555-"),
      s"unredacted PII survived: ${got(0L)._3}")
    assert(got(0L)._3.contains("contact <EMAIL> now") &&
      got(0L)._3.contains("call <PHONE> today"))
    assert(got(1L) == ((1L, 0L, "reach me at <EMAIL> for details")))
    assert(got(2L) == ((0L, 0L, "no pii in this one")))
    // mixed-case PII must redact too — a lowercase-only pattern in a
    // redaction op is a silent leak
    val mixed = graft.Graft.redactPii(
      Seq("mail Bob.Smith@Example.COM today").toDF("t"), "t")
      .select($"n_emails", $"redacted").as[(Long, String)].head()
    assert(mixed == ((1L, "mail <EMAIL> today")), s"got $mixed")
    assert(got(3L)._1 == 1L && got(3L)._3.endsWith("contact <EMAIL> now"))
    assert(got(5L)._2 == 1L && got(5L)._3.endsWith("call <PHONE> today"))
  }

  test("t16 plan: vocab joins broadcast (the shipped-LM shape), doc agg is partial+final") {
    val plan = TextAnalysis.t16UnigramNll(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"unigram table must broadcast like a shipped LM:\n$plan")
    val aggIdx = plan.indexOf("HashAggregate")
    assert(aggIdx >= 0 && plan.indexOf("HashAggregate", aggIdx + 1) >= 0,
      s"per-doc mean must partial-aggregate map-side:\n$plan")
  }

  test("t17 plan: extract is a pure map feeding one partial-aggregated shuffle") {
    val plan = TextAnalysis.t17Domains(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"domain stats need no join:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial_"),
      s"domain counts must partial-aggregate:\n$plan")
  }

  test("t14 plan: stats broadcast, top-k via TakeOrderedAndProject (no global sort)") {
    val dir = docsDir(Seq(1L -> "spark window batch", 2L -> "spark only here"))
    val plan = TextAnalysis.t14Bm25(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k must not global-sort:\n$plan")
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"the one-row stats side must broadcast:\n$plan")
  }
}
