package graft.ops

import graft.{Graft, SparkSuiteBase}
import org.apache.spark.sql.functions._

/** Facade specs for the association / frontier / spatial / series
  * diagnostics: basketPairs, skyline2D, gridRadiusJoin, maxDrawdown,
  * benfordProfile, cusumChangepoint, hllUnionRegisters. */
class AssocFrontierSpec extends SparkSuiteBase {
  import spark.implicits._

  test("basketPairs counts co-occurrence and exact integer metrics") {
    // baskets: 1:{a,b,c} 2:{a,b} 3:{a} 4:{b,c,b-dup}
    val df = Seq((1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"),
      (3, "a"), (4, "b"), (4, "c"), (4, "b")).toDF("b", "i")
    val out = Graft.basketPairs(df, "b", "i").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7)))).toMap
    // n_baskets=4, n_a=3, n_b=3, n_c=2
    assert(out(("a", "b")) == ((2L, 3L, 3L, 666L, 666L, 888888L)))
    assert(out(("a", "c")) == ((1L, 3L, 2L, 333L, 500L, 666666L)))
    assert(out(("b", "c")) == ((2L, 3L, 2L, 666L, 1000L, 1333333L)))
    assert(out.size == 3)
  }

  test("basketPairs respects minPairCount and the maxBasketSize guard") {
    val df = Seq((1, "a"), (1, "b"), (2, "a"), (2, "b"), (2, "c"))
      .toDF("b", "i")
    val filtered = Graft.basketPairs(df, "b", "i", minPairCount = 2L)
    assert(filtered.select("item_a", "item_b").as[(String, String)]
      .collect().toSet == Set(("a", "b")))
    val e = intercept[Exception] {
      Graft.basketPairs(df, "b", "i", maxBasketSize = 2).collect()
    }
    assert(String.valueOf(e.getMessage).contains("maxBasketSize"))
  }

  test("skyline2D keeps exactly the non-dominated points with counts") {
    // frontier: (1,9) (3,4) (5,1); (3,9) dominated by (1,9) on x-tie
    // rule; (5,4) dominated by (3,4); duplicate frontier point counted
    val pts = Seq((1, 9), (1, 9), (3, 4), (3, 9), (5, 1), (5, 4), (7, 7))
      .toDF("x", "y")
    val got = Graft.skyline2D(pts, "x", "y")
      .select($"x".as[Long], $"y".as[Long], $"n_rows".as[Long])
      .collect().toSet
    assert(got == Set((1L, 9L, 2L), (3L, 4L, 1L), (5L, 1L, 1L)))
  }

  test("skyline2D equals the quadratic definition on random data") {
    val rows = (1 to 200).map { i =>
      val x = (i * 48271) % 37; val y = (i * 16807) % 41; (x, y)
    }
    val df = rows.toDF("x", "y").repartition(7)
    val got = Graft.skyline2D(df, "x", "y")
      .select($"x".as[Long], $"y".as[Long]).collect().toSet
    val coords = rows.map { case (x, y) => (x.toLong, y.toLong) }.toSet
    val want = coords.filter { case (x, y) =>
      !coords.exists { case (a, b) => a <= x && b <= y && (a < x || b < y) }
    }
    assert(got == want)
  }

  test("gridRadiusJoin finds exactly the in-radius pairs, once each") {
    // cross-cell neighbors, negative coordinates, an out-of-range pair
    val pts = Seq((1L, 0L, 0L), (2L, 9L, 0L), (3L, -9L, 0L),
      (4L, 100L, 100L), (5L, 0L, 11L)).toDF("id", "x", "y")
    val got = Graft.gridRadiusJoin(pts, "id", "x", "y", radius = 10L)
      .select($"id_a".as[Long], $"id_b".as[Long], $"dist_sq".as[Long])
      .collect().sorted
    // (2,3) is 18 apart (324 > 100) and (1,5) is 11 up (121 > 100)
    assert(got.toSeq == Seq((1L, 2L, 81L), (1L, 3L, 81L)))
  }

  test("gridRadiusJoin equals brute force on random points") {
    val pts = (1 to 120).map { i =>
      (i.toLong, ((i * 48271) % 200 - 100).toLong,
        ((i * 16807) % 200 - 100).toLong)
    }
    val df = pts.toDF("id", "x", "y").repartition(5)
    val r = 25L
    val got = Graft.gridRadiusJoin(df, "id", "x", "y", r)
      .select($"id_a".as[Long], $"id_b".as[Long]).collect().toSet
    val want = (for {
      a <- pts; b <- pts if a._1 < b._1
      dx = a._2 - b._2; dy = a._3 - b._3
      if dx * dx + dy * dy <= r * r
    } yield (a._1, b._1)).toSet
    assert(got == want)
  }

  test("maxDrawdown reports the worst peak-to-trough with earliest witness") {
    // series k1: 5, -3, 1, -4, 6 → cum 5 2 3 -1 5; peak 5; dd 0 3 2 6 0
    val df = Seq(("k1", 1, 5), ("k1", 2, -3), ("k1", 3, 1), ("k1", 4, -4),
      ("k1", 5, 6), ("k2", 1, 2), ("k2", 2, 2)).toDF("k", "t", "d")
    val got = Graft.maxDrawdown(df, "k", Seq($"t"), $"d")
      .select($"k", $"n_points", $"final_value", $"high_water",
        $"max_drawdown", $"trough_rn")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5, t._6))).toMap
    assert(got("k1") == ((5L, 5L, 5L, 6L, 4L)))
    assert(got("k2") == ((2L, 4L, 4L, 0L, 1L))) // monotone: dd 0, first row
  }

  test("benfordProfile zero-fills digits and pins the expectation") {
    val df = Seq(11L, 12L, 19L, 25L, 900L, -5L, 0L).toDF("v")
    val got = Graft.benfordProfile(df, "v")
      .select($"digit".as[Int], $"n".as[Long], $"obs_permille".as[Long],
        $"exp_permille".as[Long], $"dev_permille".as[Long])
      .collect().sortBy(_._1)
    assert(got.length == 9)
    assert(got(0) == ((1, 3L, 600L, 301L, 299L))) // 3 of 5 positive
    assert(got(1) == ((2, 1L, 200L, 176L, 24L)))
    assert(got(8) == ((9, 1L, 200L, 46L, 154L)))
    assert(got(2) == ((3, 0L, 0L, 125L, -125L))) // zero-filled
  }

  test("cusumChangepoint finds the mean shift; singletons omitted") {
    // u1: 1,1,1,100,100 → split at k=3; u2 has one point → omitted
    val df = Seq((1, 1, 1L), (1, 2, 1L), (1, 3, 1L), (1, 4, 100L),
      (1, 5, 100L), (2, 1, 7L)).toDF("u", "t", "v")
    val got = Graft.cusumChangepoint(df, "u", Seq($"t"), $"v").collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("cp_rn") == 3L)
    assert(r.getAs[Long]("n_points") == 5L)
    assert(r.getAs[Long]("total") == 203L)
    // score at k=3: |5*3 - 3*203| = 594
    assert(r.getAs[Long]("score") == 594L)
    assert(r.getAs[Long]("mean_before_permille") == 1000L)
    assert(r.getAs[Long]("mean_after_permille") == 100000L)
  }

  test("hllUnionRegisters is per-bucket max with 0 for missing buckets") {
    val a = Seq((0L, 3L, 2), (1L, 1L, 5)).toDF("bucket", "n_keys", "max_rho")
    val b = Seq((1L, 2L, 3), (2L, 4L, 7)).toDF("bucket", "n_keys", "max_rho")
    val got = Graft.hllUnionRegisters(a, b)
      .select($"bucket".as[Long], $"rho_a".as[Int], $"rho_b".as[Int],
        $"rho_union".as[Int]).collect().sortBy(_._1)
    assert(got.toSeq == Seq((0L, 2, 0, 2), (1L, 5, 3, 5), (2L, 0, 7, 7)))
  }

  test("new diagnostics are partitioning-invariant under repartition(7)") {
    val df = (1 to 300).map { i =>
      (i % 9, i, ((i * 48271) % 50 - 10).toLong)
    }.toDF("k", "t", "v")
    def run(d: org.apache.spark.sql.DataFrame) = (
      Graft.maxDrawdown(d, "k", Seq($"t"), $"v").collect().toSet,
      Graft.cusumChangepoint(d, "k", Seq($"t"), $"v").collect().toSet)
    assert(run(df) == run(df.repartition(7)))
  }
}
