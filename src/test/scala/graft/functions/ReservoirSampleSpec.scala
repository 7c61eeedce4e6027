package graft.functions

import graft.SparkSuiteBase
import org.apache.spark.sql.functions._

/** The bounded-reservoir aggregate's contracts: bottom-k semantics,
  * partitioning-independence (the mergeability proof that matters),
  * k-bounded state, and tie determinism. */
class ReservoirSampleSpec extends SparkSuiteBase {

  private def sample(df: org.apache.spark.sql.DataFrame, k: Int) =
    graft.Graft.reservoirSample(df, "key", col("hv"), col("v"), k)
      .orderBy(col("key"), col("rk"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  test("keeps exactly the k smallest (hash, payload) pairs per key") {
    import spark.implicits._
    // key "a": hashes 50,40,30,20,10 for payloads 1..5 -> bottom-3 is
    // payloads 5,4,3 (hash order 10,20,30); key "b" has fewer than k
    val df = Seq(
      ("a", 50L, 1L), ("a", 40L, 2L), ("a", 30L, 3L), ("a", 20L, 4L),
      ("a", 10L, 5L), ("b", 7L, 9L), ("b", 3L, 8L)
    ).toDF("key", "hv", "v")
    assert(sample(df, 3) === Seq(
      ("a", 1L, 5L), ("a", 2L, 4L), ("a", 3L, 3L),
      ("b", 1L, 8L), ("b", 2L, 9L)))
  }

  test("sample is independent of partitioning (merge = bottom-k of union)") {
    import spark.implicits._
    val df = (1L to 500L).map(i => ("k" + (i % 3), i * 2654435761L % 1000003L, i))
      .toDF("key", "hv", "v")
    val one = sample(df.coalesce(1), 7)
    val many = sample(df.repartition(13), 7)
    val skewed = sample(df.repartition(2, col("v")), 7)
    assert(one === many, "13-way partial merge changed the sample")
    assert(one === skewed, "value-partitioned merge changed the sample")
  }

  test("equal hashes tie-break on payload") {
    import spark.implicits._
    val df = Seq(("a", 5L, 30L), ("a", 5L, 10L), ("a", 5L, 20L))
      .toDF("key", "hv", "v")
    assert(sample(df, 2) === Seq(("a", 1L, 10L), ("a", 2L, 20L)))
  }

  test("buffer never exceeds k elements") {
    val agg = ReservoirSample(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.catalyst.expressions.BoundReference(1,
        org.apache.spark.sql.types.LongType, nullable = true), 4)
    val buf = agg.createAggregationBuffer()
    (1L to 100L).foreach { i =>
      agg.update(buf, org.apache.spark.sql.catalyst.InternalRow(
        i * 37 % 101, i))
      assert(buf.size <= 4, s"buffer grew past k at row $i")
    }
    // serialize/deserialize roundtrip preserves the reservoir
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.toList.sorted === buf.toList.sorted)
  }
}
