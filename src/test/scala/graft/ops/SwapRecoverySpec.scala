package graft.ops

import org.apache.hadoop.fs.Path

import graft.SparkSuiteBase
import graft.internal.{LayoutFs, SwapJournal}
import org.apache.spark.sql.functions._

/** The r18 hardening of the at-rest maintenance family: Hadoop-FS
  * routing ([[graft.internal.LayoutFs]]), the journaled crash-safe
  * swap ([[graft.internal.SwapJournal]]), and Hive-escaped partition
  * resolution in [[graft.Graft.compactOut]]. TombstoneSpec /
  * ComponentsStoreSpec pin the happy-path file-level contracts; this
  * spec pins the failure paths the r17 advice flagged — a crashed
  * swap must RECOVER to the committed state (never destroy the staged
  * survivors), and a purge against an escaped or vanished partition
  * value must resolve or abort loudly, never silently drop. */
class SwapRecoverySpec extends SparkSuiteBase {
  import spark.implicits._

  private def lfsOf(path: String): (LayoutFs, Path) =
    LayoutFs.of(spark, path)

  test("crashed swap (journal written, nothing executed): next pass completes it from staged data") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-swaprec").toString + "/idx"
    val rows = Seq((1L, 0, "a"), (2L, 0, "b"), (3L, 1, "c"))
      .toDF("id", "sig", "payload")
    graft.Graft.writePartitioned(rows, "sig", path)
    val (lfs, root) = lfsOf(path)

    // Simulate a compact-out that purged id 1 from sig=0 and crashed
    // right after committing its journal: staging holds the rewritten
    // partition, originals are still in place, journal names both.
    val staging = new Path(root.getParent, root.getName + "__purging")
    Seq((2L, 0, "b")).toDF("id", "sig", "payload")
      .repartition(col("sig"))
      .write.partitionBy("sig").mode("overwrite").parquet(staging.toString)
    val oldFiles = lfs.dataFiles(new Path(root, "sig=0"))
      .map(f => s"sig=0/${f.getPath.getName}").toSeq
    // commit() itself executes the swap, so reproduce the crash state
    // by journaling through a throwaway layout copy: write the journal
    // bytes, then verify recover() replays them.
    val plan = SwapJournal.Plan(staged = Seq("sig=0"),
      oldFiles = oldFiles, drops = Nil)
    // Private serialize — go through commit on a scratch dir to grab
    // the journal format? Simpler: recover() must treat an absent
    // journal as "pre-commit crash", so first pin THAT: staging
    // without journal is discarded and originals survive.
    SwapJournal.recover(lfs, root, staging)
    assert(!lfs.exists(staging), "pre-commit staging must be discarded")
    assert(spark.read.parquet(path).count() == 3,
      "pre-commit crash must leave originals authoritative")

    // Now the post-commit crash: rebuild staging, write the journal
    // exactly as commit() would, and crash before any move by calling
    // recover() as the next pass does.
    Seq((2L, 0, "b")).toDF("id", "sig", "payload")
      .repartition(col("sig"))
      .write.partitionBy("sig").mode("overwrite").parquet(staging.toString)
    lfs.writeText(SwapJournal.journalPath(root),
      (Seq("S\t" + staging.getName) ++ plan.staged.map("P\t" + _) ++
        plan.oldFiles.map("O\t" + _)).mkString("", "\n", "\n"))
    SwapJournal.recover(lfs, root, new Path(root.getParent, "unused__staging"))
    assert(!lfs.exists(SwapJournal.journalPath(root)), "journal must clear")
    assert(!lfs.exists(staging), "journaled staging must clear")
    val after = spark.read.parquet(path).select($"id").as[Long]
      .collect().sorted
    assert(after.toSeq == Seq(2L, 3L),
      s"recovery must land the staged state, got ${after.toSeq}")
  }

  test("recovery replay is idempotent over a half-executed swap (moves done, deletes pending)") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-swaphalf").toString + "/idx"
    graft.Graft.writePartitioned(
      Seq((1L, 0, "a"), (2L, 0, "b")).toDF("id", "sig", "payload"),
      "sig", path)
    val (lfs, root) = lfsOf(path)
    val staging = new Path(root.getParent, root.getName + "__purging")
    Seq((2L, 0, "b")).toDF("id", "sig", "payload")
      .repartition(col("sig"))
      .write.partitionBy("sig").mode("overwrite").parquet(staging.toString)
    val oldFiles = lfs.dataFiles(new Path(root, "sig=0"))
      .map(f => s"sig=0/${f.getPath.getName}").toSeq
    lfs.writeText(SwapJournal.journalPath(root),
      (Seq("S\t" + staging.getName, "P\tsig=0") ++ oldFiles.map("O\t" + _))
        .mkString("", "\n", "\n"))
    // half-execute: move the staged files in, crash before deletes —
    // the layout momentarily holds old AND new files (duplicates, the
    // documented recoverable side of the window)
    val target = new Path(root, "sig=0")
    lfs.dataFiles(new Path(staging, "sig=0"))
      .foreach(f => lfs.moveInto(f.getPath, target))
    assert(spark.read.parquet(path).count() == 3, "mid-swap shows duplicates")
    SwapJournal.recover(lfs, root, staging)
    val after = spark.read.parquet(path).select($"id").as[Long]
      .collect().sorted
    assert(after.toSeq == Seq(2L),
      s"recovery must finish the deletes exactly once, got ${after.toSeq}")
  }

  test("compactOut resolves Hive-escaped partition values and purges them physically") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-swapesc").toString + "/idx"
    // partition values the writer must escape in dir names: a slash,
    // an equals sign, a colon (all in Hive's escape set)
    val rows = Seq((1L, "a/b", "x"), (2L, "a/b", "y"),
      (3L, "k=v", "z"), (4L, "c:d", "w")).toDF("id", "grp", "payload")
    graft.Graft.writePartitioned(rows, "grp", path)
    val (lfs, root) = lfsOf(path)
    assert(lfs.partitionDirs(root, "grp").length == 3)

    graft.Graft.tombstone(path,
      Seq((1L, "a/b"), (3L, "k=v")).toDF("id", "grp"), "id", "grp")
    val rewritten = graft.Graft.compactOut(spark, path, "grp", "id")
    assert(rewritten == 2, s"expected 2 escaped partitions rewritten, got $rewritten")
    val after = spark.read.parquet(path)
      .select($"id", $"grp").as[(Long, String)].collect().sortBy(_._1)
    assert(after.toSeq == Seq((2L, "a/b"), (4L, "c:d")),
      s"escaped-value purge wrong: ${after.toSeq}")
    // k=v partition emptied entirely -> its dir drops
    assert(lfs.partitionDirs(root, "grp").length == 2,
      "fully-purged escaped partition dir must drop")
    // idempotent re-run of an already-executed purge: the values'
    // rows are gone (one dir dropped), so it must succeed quietly
    graft.Graft.tombstone(path,
      Seq((3L, "k=v")).toDF("id", "grp"), "id", "grp")
    assert(graft.Graft.compactOut(spark, path, "grp", "id") == 0)
  }

  test("ivfMigrate: donors rewrite, pure recipients keep files byte-identical and gain the movers") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-ivfmig").toString + "/idx"
    // old model put b in cell 0; the retrained centroids (c0=(1,0),
    // c1=(0,1)) send it to cell 1 — a stays, c stays
    val rows = Seq(
      (10L, Array(1.0f, 0.0f), 0),  // a: stays in 0
      (11L, Array(0.0f, 1.0f), 0),  // b: moves 0 -> 1
      (12L, Array(0.1f, 1.0f), 1))  // c: stays in 1
      .toDF("vec_id", "embedding", "cell")
    graft.Graft.writePartitioned(rows, "cell", path)
    val (lfs, root) = lfsOf(path)
    def files(dir: String): Map[String, Long] =
      lfs.dataFiles(new Path(root, dir))
        .map(f => f.getPath.getName -> f.getLen).toMap
    val preCell1 = files("cell=1")

    val cent = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("centroid_id", "c")
    val rewritten = graft.Graft.ivfMigrate(spark, path, cent)
    assert(rewritten == 1, s"only the donor cell should rewrite, got $rewritten")
    val atRest = spark.read.parquet(path)
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toMap
    assert(atRest == Map(10L -> 0, 11L -> 1, 12L -> 1),
      s"migrated assignment wrong: $atRest")
    // the recipient keeps its original file untouched and gains the
    // staged mover file
    val postCell1 = files("cell=1")
    preCell1.foreach { case (n, len) =>
      assert(postCell1.get(n).contains(len),
        s"recipient's pre-existing file $n changed (pre=$len post=${postCell1.get(n)})")
    }
    assert(postCell1.size > preCell1.size, "mover file must append to the recipient")
    // idempotent: a second migration against the same model moves nothing
    assert(graft.Graft.ivfMigrate(spark, path, cent) == 0)
  }

  test("ivfMigrate drops a donor cell emptied of every row (after retention expiry)") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-ivfmigdrop").toString + "/idx"
    val rows = Seq(
      (20L, Array(0.0f, 1.0f), 0),  // whole of cell 0 moves to 1
      (21L, Array(0.1f, 1.0f), 1))
      .toDF("vec_id", "embedding", "cell")
    graft.Graft.writePartitioned(rows, "cell", path)
    val cent = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("centroid_id", "c")
    assert(graft.Graft.ivfMigrate(spark, path, cent) == 1)
    // the emptied donor's SNAPSHOT is gone immediately…
    val atRest = graft.Graft.readSnapshot(spark, path)
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toMap
    assert(atRest == Map(20L -> 1, 21L -> 1))
    // …but its files stay on disk for the pre-migration snapshot until
    // retention expires them — then the emptied dir drops physically
    val (lfs, root) = lfsOf(path)
    assert(lfs.partitionDirs(root, "cell").map(_.getName).sorted.toSeq
      == Seq("cell=0", "cell=1"),
      "donor dir must linger while the pre-migration snapshot is retained")
    graft.Graft.expireSnapshots(spark, path, retain = 1)
    assert(lfs.partitionDirs(root, "cell").map(_.getName).sorted.toSeq
      == Seq("cell=1"), "emptied donor dir must drop at snapshot expiry")
    assert(spark.read.parquet(path)
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toMap
      == Map(20L -> 1, 21L -> 1))
  }

  test("componentsPurge drops a fully-emptied bucket directory") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-swapempty").toString + "/idx"
    // one two-node component {1,2}: its single bucket must vanish
    // when both members purge (no empty rb= dirs left behind)
    graft.Graft.componentsIndex(
      TextDedup.componentMin(Seq((2L, 1L)).toDF("id_a", "id_b")), path)
    val (lfs, root) = lfsOf(path)
    assert(lfs.partitionDirs(root, "rb").length == 1)
    assert(graft.Graft.componentsPurge(spark, path,
      Seq(1L, 2L).toDF("id")) == 1)
    assert(lfs.partitionDirs(root, "rb").isEmpty,
      "emptied bucket dir must drop, not linger empty")
  }
}
