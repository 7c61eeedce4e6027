package graft.ops

import graft.{Graft, SparkSuiteBase}
import org.apache.spark.sql.functions._

/** Facade specs for the distributed-scan diagnostics: distributedCumSum,
  * abcClasses, autocorrDiag. */
class ScanDiagSpec extends SparkSuiteBase {
  import spark.implicits._

  test("distributedCumSum equals the sequential prefix sum") {
    val rows = (1 to 500).map(i => (i, ((i * 48271) % 97 - 20).toLong))
    val df = rows.toDF("t", "v").repartition(7)
    val got = Graft.distributedCumSum(df, Seq($"t"), $"v")
      .select($"t".as[Int], $"cum".as[Long]).collect().toMap
    var acc = 0L
    rows.foreach { case (t, v) =>
      acc += v
      assert(got(t) == acc, s"cum mismatch at t=$t")
    }
    assert(got.size == 500)
  }

  test("distributedCumSum honors a descending order spec") {
    val df = Seq((1, 10L), (2, 20L), (3, 30L)).toDF("k", "v")
    val got = Graft.distributedCumSum(df, Seq($"v".desc), $"v")
      .select($"k".as[Int], $"cum".as[Long]).collect().toMap
    assert(got == Map(3 -> 30L, 2 -> 50L, 1 -> 60L))
  }

  test("abcClasses ranks by value desc and cuts at the permille bounds") {
    // values: a=500 b=300 c=150 d=50 (total 1000): cum 500/800/950/1000
    // → A (500 ≤ 800), A (800 ≤ 800), B (950 ≤ 950), C
    val df = Seq(("a", 500), ("b", 300), ("c", 150), ("d", 50))
      .flatMap { case (k, v) => Seq((k, v / 2), (k, v - v / 2)) }
      .toDF("k", "v")
    val got = Graft.abcClasses(df, "k", $"v")
      .select($"k".as[String], $"value".as[Long], $"cum".as[Long],
        $"abc_class".as[String]).collect().map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 500L, 500L, "A")))
    assert(got("b") == (("b", 300L, 800L, "A")))
    assert(got("c") == (("c", 150L, 950L, "B")))
    assert(got("d") == (("d", 50L, 1000L, "C")))
  }

  test("autocorrDiag matches hand-computed scaled moments") {
    // series 1,2,3 (n=3, T=6): dev = 3x-6 → -3,0,3
    // num (lag1) = dev2*dev1 + dev3*dev2 = 0 + 0 = 0; den = 9+0+9 = 18
    // series 5,5 (n=2, T=10): dev = 0,0 → num 0, den 0
    val df = Seq((1, 1, 1L), (1, 2, 2L), (1, 3, 3L), (2, 1, 5L), (2, 2, 5L),
      (3, 1, 9L)).toDF("k", "t", "v")
    val got = Graft.autocorrDiag(df, "k", Seq($"t"), $"v")
      .select($"k".as[Int], $"n_points".as[Long], $"total".as[Long],
        $"num_scaled".as[Long], $"den_scaled".as[Long])
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1) == ((3L, 6L, 0L, 18L)))
    assert(got(2) == ((2L, 10L, 0L, 0L)))
    assert(!got.contains(3)) // singleton: no valid lag pair
  }

  test("autocorrDiag detects alternation (negative num) and trend (positive)") {
    // alternating 0,10,0,10 → strongly negative lag-1 covariance
    val alt = Seq.tabulate(8)(i => (1, i, if (i % 2 == 0) 0L else 10L))
    // increasing 1..8 → positive lag-1 covariance
    val inc = Seq.tabulate(8)(i => (2, i, (i + 1).toLong))
    val got = Graft.autocorrDiag((alt ++ inc).toDF("k", "t", "v"),
        "k", Seq($"t"), $"v")
      .select($"k".as[Int], $"num_scaled".as[Long]).collect().toMap
    assert(got(1) < 0L)
    assert(got(2) > 0L)
  }

  test("corrMoments emits exact sufficient statistics per pair") {
    // x = 1,2,3; y = 2,4,6 (y = 2x, perfectly correlated); z = 5,5,5
    val df = Seq((1, 2, 5), (2, 4, 5), (3, 6, 5)).toDF("x", "y", "z")
    val got = Graft.corrMoments(df, Seq("x" -> $"x", "y" -> $"y",
        "z" -> $"z"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7)))).toMap
    // (x,y): n=3 Σx=6 Σy=12 Σx²=14 Σy²=56 Σxy=28
    assert(got(("x", "y")) == ((3L, 6L, 12L, 14L, 56L, 28L)))
    // Pearson numerator nΣxy−ΣxΣy = 84−72 = 12 > 0; z is constant:
    assert(got(("x", "z")) == ((3L, 6L, 15L, 14L, 75L, 30L)))
    assert(got(("y", "z")) == ((3L, 12L, 15L, 56L, 75L, 60L)))
    assert(got.size == 3)
  }

  test("corrMoments drops rows with any null measure (listwise)") {
    val df = Seq((Some(1), Some(2)), (Some(2), None), (None, Some(9)),
      (Some(3), Some(6))).toDF("x", "y")
    val r = Graft.corrMoments(df, Seq("x" -> $"x", "y" -> $"y"))
      .collect().head
    assert(r.getAs[Long]("n_rows") == 2L)
    assert(r.getAs[Long]("sum_x") == 4L)
    assert(r.getAs[Long]("sum_y") == 8L)
  }

  test("minhashShardSignatures: merged __all__ row equals a from-scratch corpus signature") {
    val df = Seq(("s1", "alpha beta gamma"), ("s1", "beta delta"),
      ("s2", "epsilon zeta"), ("s3", "alpha zeta eta theta"))
      .toDF("src", "text")
    val sigs = Graft.minhashShardSignatures(df, "src", "text", numPerms = 8)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    assert(sigs.size == 4 * 8)
    // from scratch over the whole corpus: one group
    val scratch = Graft.minhashShardSignatures(
        df.withColumn("src", lit("c")), "src", "text", numPerms = 8)
      .filter($"grp" === "c")
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    for (p <- 0 until 8) {
      assert(sigs(("__all__", p)) == scratch(p),
        s"merge != rescan at perm $p")
      // and the merge really is the element-wise min of the shards
      assert(sigs(("__all__", p)) ==
        Seq("s1", "s2", "s3").map(g => sigs((g, p))).min)
    }
  }

  test("scan ops are partitioning-invariant under repartition(7)") {
    val df = (1 to 300).map { i => (i % 11, i, ((i * 16807) % 50).toLong) }
      .toDF("k", "t", "v")
    def run(d: org.apache.spark.sql.DataFrame) = (
      Graft.abcClasses(d, "k", $"v").collect().toSet,
      Graft.autocorrDiag(d, "k", Seq($"t"), $"v").collect().toSet)
    assert(run(df) == run(df.repartition(7)))
  }
}
