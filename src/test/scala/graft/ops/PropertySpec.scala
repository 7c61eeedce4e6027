package graft.ops

import graft.SparkSuiteBase
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generator property tests (SURVEY.md §5.3) for the scalar
  * kernels — cheap invariants the oracle can't state. (Generators are
  * sampled with a fixed seed — scalatestplus isn't in the offline
  * cache, and determinism is a feature here anyway.) */
class PropertySpec extends SparkSuiteBase {
  import spark.implicits._

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)

  /** Deterministic sampling of a generator (fixed seed per call site). */
  private def samples[A](g: Gen[A], n: Int, seedNo: Long = 42L): Seq[A] = {
    var seed = Seed(seedNo)
    (1 to n).flatMap { _ =>
      val r = g.apply(Gen.Parameters.default, seed)
      seed = seed.next
      r
    }
  }

  private def forAll[A](g: Gen[A], n: Int = 12)(body: A => Unit): Unit =
    samples(g, n).foreach(body)

  private def whenever(cond: Boolean)(body: => Unit): Unit =
    if (cond) body

  test("mask preserves length+1 and the suffix (P8 intent)") {
    forAll(Gen.listOfN(8, word.suchThat(_.length >= 4))) { words =>
      whenever(words.nonEmpty) {
        val out = words.toDF("account")
          .select($"account",
            concat(lit("XXXX"), expr("substring(account, 4)")).as("mask"))
          .as[(String, String)].collect()
        out.foreach { case (acc, mask) =>
          assert(mask.startsWith("XXXX"))
          assert(mask.drop(4) == acc.drop(3))
          assert(mask.length == acc.length + 1)
        }
      }
    }
  }

  test("date reassembly round-trips any timestamp at second precision (P10)") {
    val tsGen = Gen.choose(0L, 4102444800L) // 1970..2100 epoch seconds
    forAll(Gen.listOfN(8, tsGen)) { secs =>
      whenever(secs.nonEmpty) {
        val out = secs.toDF("s")
          .select(timestamp_seconds($"s").as("ts"))
          .select($"ts",
            date_format($"ts", "yyyyMMdd").as("d"),
            date_format($"ts", "HHmmss").as("t"))
          .select($"ts", to_timestamp(concat(
            substring($"d", 1, 4), lit("-"), substring($"d", 5, 2), lit("-"),
            substring($"d", 7, 2), lit(" "),
            substring($"t", 1, 2), lit(":"), substring($"t", 3, 2), lit(":"),
            substring($"t", 5, 2))).as("rt"))
          .as[(java.sql.Timestamp, java.sql.Timestamp)].collect()
        out.foreach { case (ts, rt) => assert(rt == ts) }
      }
    }
  }

  test("explode row count equals the sum of array sizes (P5/P6)") {
    val arrGen = Gen.listOf(Gen.choose(0, 100))
    forAll(Gen.listOfN(6, arrGen)) { arrays =>
      val df = arrays.zipWithIndex.map { case (a, i) => (i.toLong, a) }.toDF("id", "xs")
      val exploded = df.select($"id", explode($"xs")).count()
      assert(exploded == arrays.map(_.size).sum)
      // explode_outer additionally keeps one row per empty array
      val outer = df.select($"id", explode_outer($"xs")).count()
      assert(outer == arrays.map(a => math.max(a.size, 1)).sum)
    }
  }

  test("minhash signature agreement estimates jaccard (K-M rotate-XOR family)") {
    // docs sharing a known fraction of shingles: the per-component
    // collision probability of a MinHash signature IS the jaccard, so
    // the match fraction over 64 components concentrates around it
    // (sd ~ sqrt(j(1-j)/64) ~ 0.06) — a broken hash family (correlated
    // components) blows this bound
    val base = (1 to 30).map(i => s"w$i")
    for (keep <- Seq(30, 20, 10)) {
      val a = base.mkString(" ")
      val b = (base.take(keep) ++ (1 to (30 - keep)).map(i => s"v$i")).mkString(" ")
      val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
      val trueJ = TextDedup.jaccardVerify(docs, Seq((1L, 2L)).toDF("id_a", "id_b"))
        .select($"jaccard").as[Double].head()
      val sig = TextDedup.minhashSig(docs, 64).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1))
        .toMap
      val est = sig(1L).zip(sig(2L)).count { case (x, y) => x == y } / 64.0
      assert(math.abs(est - trueJ) < 0.25,
        s"keep=$keep: estimate $est vs true $trueJ — hash family broken?")
    }
  }

  test("jaccard is 1 for identical, 0 for disjoint, symmetric otherwise") {
    forAll(Gen.zip(Gen.listOfN(12, word), Gen.listOfN(12, word))) { case (as, bs) =>
      whenever(as.nonEmpty && bs.nonEmpty) {
        val textA = as.mkString(" ") + " " + as.mkString(" ") // >= 2x3 tokens
        val textB = bs.mkString(" ") + " " + bs.mkString(" ")
        val docs = Seq((1L, textA), (2L, textB)).toDF("doc_id", "text")
        val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
        val j = TextDedup.jaccardVerify(docs, pairs)
          .select($"jaccard").as[Double].head()
        assert(j >= 0.0 && j <= 1.0)
        val jSwap = TextDedup.jaccardVerify(
          Seq((1L, textB), (2L, textA)).toDF("doc_id", "text"), pairs)
          .select($"jaccard").as[Double].head()
        assert(math.abs(j - jSwap) < 1e-12) // symmetric
      }
    }
  }

  test("winnow fingerprints are a subset of the rolling hashes and nonempty iff len >= 11") {
    // 0-8 words so BOTH branches are exercised (a fixed 8 nonempty
    // words is always >= 15 chars and the short side would be dead)
    forAll(Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, word))) { ws =>
      val text = ws.mkString(" ")
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val fps = df.select(TextAnalysis.winnowFps($"text").as("f"))
        .as[Seq[String]].head()
      if (text.length < 11) assert(fps.isEmpty)
      else {
        assert(fps.nonEmpty)
        // every selected fingerprint is one of the doc's 8-gram hashes
        val all = df.select(transform(
            sequence(lit(1), greatest(length($"text") - 7, lit(0))),
            i => md5(substring($"text", i, lit(8)).cast("binary"))).as("h"))
          .as[Seq[String]].head().toSet
        assert(fps.forall(all.contains))
        assert(fps.distinct == fps) // distinct by construction
      }
    }
  }

  test("quality filter partitions every corpus: exactly one reason per doc, keep iff 'keep'") {
    forAll(Gen.listOfN(6, Gen.chooseNum(0, 30)), n = 6) { sizes =>
      val docs = sizes.zipWithIndex.map { case (n, i) =>
        (i.toLong, Seq.fill(n)(s"w${i % 3}").mkString(" "))
      }
      val dir = java.nio.file.Files.createTempDirectory("graft-prop").toString
      docs.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s"))
        .withColumn("n_chars", length($"text").cast("long"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val rows = TextAnalysis.t12QualityFilter(spark, dir)
        .as[(Long, Long, String, Boolean)].collect()
      assert(rows.length == docs.length) // a FILTER decision for every doc
      rows.foreach { case (_, _, reason, keep) =>
        assert(Set("too_short", "too_long", "repetitive", "keep")(reason))
        assert(keep == (reason == "keep"))
      }
    }
  }

  test("redactPii is idempotent and leaves no matchable PII behind") {
    val pii = Gen.oneOf(
      word.map(w => s"$w@example.com"),
      word.map(w => s"${w.take(3)}.${w.take(4)}@Mail.EXAMPLE.org"),
      Gen.choose(0, 9999).map(n => f"555-$n%04d"))
    forAll(Gen.listOfN(6, Gen.zip(word, pii, word))) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.zipWithIndex
          .map { case ((a, p, b), i) => (i.toLong, s"$a $p $b") }
          .toDF("id", "t")
        val once = graft.Graft.redactPii(df, "t")
          .select($"id", $"redacted".as("t"), $"n_emails" + $"n_phones")
          .as[(Long, String, Long)].collect()
        // every planted PII token was counted and removed
        assert(once.forall(_._3 == 1L), once.mkString(";"))
        assert(once.forall(r => !r._2.contains("@") && !r._2.contains("555-")))
        // idempotent: a second pass finds nothing and changes nothing
        val twice = graft.Graft.redactPii(
            once.map(r => (r._1, r._2)).toSeq.toDF("id", "t"), "t")
          .select($"id", $"redacted", $"n_emails" + $"n_phones")
          .as[(Long, String, Long)].collect()
        assert(twice.forall(_._3 == 0L))
        assert(twice.map(r => r._1 -> r._2).toMap ==
          once.map(r => r._1 -> r._2).toMap)
      }
    }
  }

  test("dedupChunks conserves chunks: per-doc kept <= total, corpus kept = distinct chunks") {
    forAll(Gen.listOfN(8, Gen.listOfN(30, Gen.oneOf("aa", "bb", "cc"))), n = 6) { docs =>
      whenever(docs.nonEmpty) {
        val df = docs.zipWithIndex
          .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
          .toDF("doc_id", "text")
        val got = graft.Graft.dedupChunks(df, "doc_id", "text", chunkLen = 5)
          .as[(Long, Long, Long, Long)].collect()
        assert(got.forall(r => r._3 <= r._2 && r._3 >= 0))
        // corpus-wide: kept chunks = number of DISTINCT chunk strings
        val expectedDistinct = docs.zipWithIndex.flatMap { case (ws, _) =>
          ws.grouped(5).map(_.mkString(" "))
        }.distinct.size
        assert(got.map(_._3).sum == expectedDistinct,
          s"kept ${got.map(_._3).sum} != distinct $expectedDistinct")
      }
    }
  }

  test("fillForward equals a reference scan over any null pattern") {
    val valGen = Gen.option(Gen.chooseNum(1, 9).map(_.toDouble))
    forAll(Gen.listOfN(12, valGen), n = 8) { vs =>
      val df = vs.zipWithIndex
        .map { case (v, i) => (i.toLong % 2, i.toLong, v) } // 2 keys interleaved
        .toDF("key", "ts", "v")
      val got = graft.Graft.fillForward(df, "key", "ts", "ts", "v")
        .select($"key", $"ts", $"filled_v")
        .as[(Long, Long, Option[Double])].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      // reference: per key, a running last-defined scan in ts order
      vs.zipWithIndex.groupBy { case (_, i) => i.toLong % 2 }
        .foreach { case (key, rows) =>
          var lastSeen: Option[Double] = None
          rows.sortBy(_._2).foreach { case (v, i) =>
            lastSeen = v.orElse(lastSeen)
            assert(got((key, i.toLong)) == lastSeen,
              s"key=$key ts=$i expected $lastSeen got ${got((key, i.toLong))}")
          }
        }
    }
  }

  test("sequence packing: bins are consecutive from 0 per shard; no doc precedes its fill") {
    forAll(Gen.listOfN(10, Gen.chooseNum(1, 700)), n = 6) { tokenCounts =>
      val df = tokenCounts.zipWithIndex
        .map { case (t, i) => (i.toLong, t.toLong) }.toDF("id", "n_tok")
      val got = graft.Graft.packSequences(df, "id", "n_tok", capacity = 512, shards = 3)
        .select($"id", $"shard", $"bin", $"n_tok")
        .as[(Long, Long, Long, Long)].collect()
      got.groupBy(_._2).foreach { case (_, rows) =>
        val sorted = rows.sortBy(_._1)
        // bin ids are non-decreasing in doc order and start at 0
        assert(sorted.head._3 == 0L)
        assert(sorted.map(_._3).toSeq.sliding(2).forall(w =>
          w.length < 2 || w(1) >= w(0)))
        // bin = cumulative-before div capacity, recomputed independently
        var cum = 0L
        sorted.foreach { case (_, _, bin, t) =>
          assert(bin == cum / 512, s"bin mismatch at cum=$cum")
          cum += t
        }
      }
    }
  }

  test("prioritySample selection is invariant under weight scaling; estimators scale") {
    // priority p = w/u is linear in w, so scaling every weight by c
    // scales every priority by c: the top-k SET and order are
    // unchanged, and tau (the k+1-th priority) scales by c — the
    // scale-free property that makes the estimator trustworthy under
    // unit changes (chars vs kilochars)
    forAll(Gen.listOfN(20, Gen.choose(1, 1000)), n = 6) { ws =>
      val rows = ws.zipWithIndex.map { case (w, i) => (i.toLong, w.toDouble) }
      val df = rows.toDF("id", "w")
      val base = graft.Graft.prioritySample(df, "id", "w", 7)
        .select($"id").as[Long].collect().toSet
      val scaled = rows.map { case (i, w) => (i, w * 4.0) }.toDF("id", "w")
      val got = graft.Graft.prioritySample(scaled, "id", "w", 7)
        .select($"id").as[Long].collect().toSet
      assert(got == base, s"selection changed under x4 weight scaling")
    }
  }

  test("funnel stage times are strictly increasing and drawn from the user's events") {
    val ts0 = 1700000000000L
    val evGen = Gen.listOfN(24, for {
      u <- Gen.choose(0L, 3L)
      dt <- Gen.choose(0L, 1000L)
      tp <- Gen.oneOf("view", "click", "purchase")
    } yield (u, new java.sql.Timestamp(ts0 + dt * 1000), tp))
    forAll(evGen, n = 6) { evs =>
      val df = evs.toDF("uid", "ts", "etype")
      val got = graft.Graft.funnel(df, "uid", "ts", "etype",
          Seq("view", "click", "purchase"))
        .select($"uid", $"stage_ts")
        .as[(Long, Seq[Option[java.sql.Timestamp]])].collect()
      got.foreach { case (uid, stages) =>
        val defined = stages.takeWhile(_.isDefined).flatten
        // no gap: a filled stage never follows an unfilled one
        assert(stages.drop(defined.size).forall(_.isEmpty), s"gap for $uid")
        // strictly increasing times
        defined.sliding(2).foreach { w =>
          if (w.length == 2) assert(w(0).getTime < w(1).getTime, s"order for $uid")
        }
        // every stage time is one of the user's own event times
        val own = evs.filter(_._1 == uid).map(_._2.getTime).toSet
        assert(defined.forall(t => own(t.getTime)), s"foreign ts for $uid")
      }
    }
  }
}
