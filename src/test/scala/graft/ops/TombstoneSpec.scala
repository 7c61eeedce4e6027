package graft.ops

import graft.SparkSuiteBase
import org.apache.spark.sql.functions._

/** [[graft.Graft.tombstone]] / [[graft.Graft.readMasked]] /
  * [[graft.Graft.compactOut]] / [[graft.Graft.componentsPurge]]
  * deletion contracts on toy layouts whose purge footprint is known
  * exactly (s29/s30/d26 gate the answers on the real fixtures; this
  * spec pins the FILE-level properties the queries can't see —
  * logical deletes leave data files byte-identical, physical deletes
  * prune to the named partitions, sidecars clear, and re-rooted label
  * rows move buckets). */
class TombstoneSpec extends SparkSuiteBase {
  import spark.implicits._

  private def dataFiles(d: java.io.File) =
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith("part-"))

  private def fileMap(path: String, pcol: String): Map[String, Long] =
    Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith(pcol + "="))
      .flatMap(d => dataFiles(d).map(f =>
        s"${d.getName}/${f.getName}" -> f.length()))
      .toMap

  test("tombstone is logical (files untouched), compactOut is physical and partition-pruned") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-tomb").toString + "/idx"
    // 3 partitions: sig=0 {1,2}, sig=1 {3,4}, sig=2 {5}
    val rows = Seq((1L, 0, "a"), (2L, 0, "b"), (3L, 1, "c"),
      (4L, 1, "d"), (5L, 2, "e")).toDF("id", "sig", "payload")
    graft.Graft.writePartitioned(rows, "sig", path)
    val pre = fileMap(path, "sig")

    // purge id 3 (partition 1 keeps id 4) and id 5 (partition 2 empties)
    graft.Graft.tombstone(path,
      Seq((3L, 1), (5L, 2)).toDF("id", "sig"), "id", "sig")
    // logical delete: masked read hides them, data files byte-identical
    val masked = graft.Graft.readMasked(spark, path, "id")
      .select($"id").as[Long].collect().sorted
    assert(masked.toSeq == Seq(1L, 2L, 4L), s"masked read wrong: ${masked.toSeq}")
    assert(fileMap(path, "sig") == pre,
      "tombstone must not touch index data files")
    // plain read still sees everything — the mask IS the delete
    assert(spark.read.parquet(path).count() == 5)

    val rewritten = graft.Graft.compactOut(spark, path, "sig", "id")
    assert(rewritten == 2, s"expected 2 rewritten partitions, got $rewritten")
    // physical delete: plain read agrees with the old mask
    val after = spark.read.parquet(path).select($"id").as[Long]
      .collect().sorted
    assert(after.toSeq == Seq(1L, 2L, 4L), s"compact-out wrong: ${after.toSeq}")
    // untouched partition byte-identical; emptied partition dropped
    val post = fileMap(path, "sig")
    assert(post.filter(_._1.startsWith("sig=0/")) ==
      pre.filter(_._1.startsWith("sig=0/")),
      "untouched partition must stay byte-identical")
    assert(!new java.io.File(path, "sig=2").exists(),
      "fully-purged partition dir must drop")
    // sidecar cleared; second compactOut is a no-op
    assert(!new java.io.File(path, "_tombstones").exists(),
      "tombstone sidecar must clear after compact-out")
    assert(graft.Graft.compactOut(spark, path, "sig", "id") == 0)
    // masked read over a sidecar-free layout is the plain scan
    assert(graft.Graft.readMasked(spark, path, "id").count() == 3)
  }

  test("masked read keeps plan-time partition pruning under the anti-join") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-tombprune").toString + "/idx"
    val rows = Seq((1L, 0, "a"), (2L, 1, "b"), (3L, 2, "c"))
      .toDF("id", "sig", "payload")
    graft.Graft.writePartitioned(rows, "sig", path)
    graft.Graft.tombstone(path, Seq((1L, 0)).toDF("id", "sig"), "id", "sig")
    // the s29 probe shape: a literal partition filter APPLIED ON TOP of
    // the masked read must still push through the anti-join to the
    // scan — at 100 TB this is the difference between listing 7 probe
    // directories and listing the index
    val probed = graft.Graft.readMasked(spark, path, "id")
      .filter($"sig".isin(1, 2))
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [sig"),
      s"partition filter did not reach the masked scan:\n$plan")
    assert(probed.select($"id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
  }

  test("componentsPurge: purged root demotes to min survivor, rows move buckets, untouched buckets byte-identical") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-tombcmp").toString + "/idx"
    // components {1,2,3} (root 1), {4,5,6} (root 4), {7,8} (root 7)
    val standing = Seq((2L, 1L), (3L, 1L), (5L, 4L), (6L, 4L), (8L, 7L))
      .toDF("id_a", "id_b")
    graft.Graft.componentsIndex(TextDedup.componentMin(standing), path)
    val pre = fileMap(path, "rb")
    def rb(root: Long): Int = spark.range(1)
      .select(pmod(xxhash64(lit(root)), lit(32)).cast("int"))
      .as[Int].head()

    // purge root 4 (component re-roots to 5) and non-root 2 (root 1 stays)
    val rewritten = graft.Graft.componentsPurge(spark, path,
      Seq(4L, 2L).toDF("id"))
    // exactly the two victims' root buckets rewrite (roots 4 and 1)
    val expectTouched = Set(rb(4L), rb(1L))
    assert(rewritten == expectTouched.size,
      s"expected ${expectTouched.size} rewritten buckets, got $rewritten")

    val atRest = graft.Graft.componentsRead(spark, path)
      .as[(Long, Long)].collect().toMap
    val expect = Map(1L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L,
      7L -> 7L, 8L -> 7L)
    assert(atRest == expect, s"purged labeling wrong: $atRest")
    // untouched bucket (root 7) byte-identical
    val post = fileMap(path, "rb")
    val b7 = s"rb=${rb(7L)}/"
    assert(post.filter(_._1.startsWith(b7)) == pre.filter(_._1.startsWith(b7)),
      "untouched bucket must stay byte-identical")
    // re-rooted rows landed in the NEW root's bucket (the invariant
    // every later pruned probe and incremental merge relies on)
    val moved = spark.read.parquet(path)
      .filter($"root" === 5L).select($"rb").distinct().as[Int].collect()
    assert(moved.toSeq == Seq(rb(5L)), s"re-rooted rows in wrong bucket: ${moved.toSeq}")
    // idempotent: victims already gone -> metadata-only no-op
    assert(graft.Graft.componentsPurge(spark, path, Seq(4L, 2L).toDF("id")) == 0)
  }
}
