package graft.ops

import graft.SparkSuiteBase
import org.apache.spark.sql.functions._

/** [[graft.Graft.componentsIndex]] / [[graft.Graft.componentsIncremental]]
  * maintenance contracts on a toy graph whose merge structure is known
  * exactly (d25 gates the answer on the real fixture; this spec pins
  * what the query can't see — the FILE-level copy-on-write properties
  * and agreement with the in-memory relabel). */
class ComponentsStoreSpec extends SparkSuiteBase {
  import spark.implicits._

  private def dataFiles(d: java.io.File) =
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith("part-"))

  private def fileMap(path: String): Map[String, Long] =
    Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith("rb="))
      .flatMap(d => dataFiles(d).map(f =>
        s"${d.getName}/${f.getName}" -> f.length()))
      .toMap

  test("componentsIncremental: at-rest relabel == in-memory == from-scratch; untouched buckets byte-identical") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-cmpstore").toString + "/idx"
    // standing: {1,2,3}, {4,5,6}, {7,8}; batch: (3,5) merges the first
    // two, (9,10) is a fresh pair, (8,11) grows component 7 with a
    // fresh vertex (root 7 survives: 7 < 8 < 11)
    val standing = Seq((2L, 1L), (3L, 1L), (5L, 4L), (6L, 4L), (8L, 7L))
      .toDF("id_a", "id_b")
    val batch = Seq((3L, 5L), (9L, 10L), (8L, 11L)).toDF("id_a", "id_b")
    val labels = TextDedup.componentMin(standing)
    graft.Graft.componentsIndex(labels, path)
    val pre = fileMap(path)

    val rewritten = graft.Graft.componentsIncremental(spark, path, batch)
    // exactly one standing root (4) is remapped -> exactly its bucket
    // directory rewrites
    assert(rewritten == 1, s"expected 1 rewritten bucket, got $rewritten")

    val expect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      6L -> 1L, 7L -> 7L, 8L -> 7L, 11L -> 7L, 9L -> 9L, 10L -> 9L)
    val atRest = graft.Graft.componentsRead(spark, path)
      .as[(Long, Long)].collect().toMap
    assert(atRest == expect, s"at-rest labeling wrong: $atRest")
    // agreement with the in-memory relabel and the from-scratch run
    val inMem = TextDedup.incrementalComponents(labels, batch)
      .as[(Long, Long)].collect().toMap
    val scratch = TextDedup.componentMin(standing.unionAll(batch))
      .select($"id", $"root").as[(Long, Long)].collect().toMap
    assert(atRest == inMem && atRest == scratch)

    // file-level copy-on-write: buckets not holding root 4 keep their
    // exact files (same names, same sizes); the appended fresh rows
    // and moved relabeled rows land as NEW files only
    val touchedRb = spark.range(1)
      .select(pmod(xxhash64(lit(4L)), lit(32)).cast("int"))
      .head().getInt(0)
    val post = fileMap(path)
    val preUntouched = pre.filter(!_._1.startsWith(s"rb=$touchedRb/"))
    preUntouched.foreach { case (f, len) =>
      assert(post.get(f).contains(len),
        s"untouched file $f changed or vanished (pre=$len post=${post.get(f)})")
    }
    assert(pre.keySet.filter(_.startsWith(s"rb=$touchedRb/"))
      .forall(!post.contains(_)), "touched bucket's old fragments survive")

    // compaction over the appended layout is answer-invariant
    graft.Graft.compactIndex(spark, path, "rb"): Unit
    val compacted = graft.Graft.componentsRead(spark, path)
      .as[(Long, Long)].collect().toMap
    assert(compacted == expect, "compaction changed the labeling")

    // a second, empty-effect batch (already-merged edge) rewrites
    // nothing and appends nothing
    val again = graft.Graft.componentsIncremental(spark, path,
      Seq((3L, 5L)).toDF("id_a", "id_b"))
    assert(again == 0, s"no-op batch rewrote $again buckets")
    assert(graft.Graft.componentsRead(spark, path)
      .as[(Long, Long)].collect().toMap == expect)
  }
}
