package graft.ops

import graft.SparkSuiteBase
import graft.ops.Multimodal.{MediaRecord, frameSampleStub, resizeStub, stubDecode}

/** Multimodal plumbing invariants (the codecs are stubs; the schema,
  * metadata, and batching contracts are the real surface). */
class MultimodalSpec extends SparkSuiteBase {

  private val rec = MediaRecord(7L, Array.tabulate[Byte](100)(_.toByte), 10, 10)

  test("stubDecode is deterministic and metadata-consistent") {
    val f1 = stubDecode(rec)
    val f2 = stubDecode(rec)
    assert(f1 == f2)
    assert(f1.n_bytes == 100L)
    assert(f1.aspect_pm == 10000L) // width*10000 div height, square
    assert(f1.first_byte == 0)     // payload bytes are 0..99
    assert(f1.content_md5.length == 32 &&
      f1.content_md5.forall("0123456789abcdef".contains(_)))
    // md5 really fingerprints the CONTENT, not the metadata
    assert(stubDecode(rec.copy(media = Array[Byte](1, 2, 3))).content_md5
      != f1.content_md5)
  }

  test("resizeStub scales payload with target area and updates metadata") {
    val bigger = resizeStub(rec, 20, 20)  // 4x area
    assert(bigger.media.length == 400)
    assert(bigger.width == 20 && bigger.height == 20)
    val smaller = resizeStub(rec, 5, 5)   // quarter area
    assert(smaller.media.length == 25)
    assert(resizeStub(rec, 20, 20).media.toSeq == bigger.media.toSeq) // deterministic
  }

  test("resizeStub survives empty media") {
    val empty = MediaRecord(1L, Array.empty[Byte], 10, 10)
    val out = resizeStub(empty, 64, 64)
    assert(out.media.isEmpty && out.width == 64 && out.height == 64)
  }

  test("m03: byte-identical payloads share a fingerprint, first occurrence keeps") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-m03").toString
    Seq(1L -> "same bytes", 2L -> "same bytes", 3L -> "different")
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Multimodal.m03MediaHash(spark, dir)
      .as[(Long, Long, String, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L)._1 == 10L) // "same bytes" is 10 UTF-8 bytes
    assert(got(1L)._2 == got(2L)._2, "identical payloads must share the md5")
    assert(got(1L)._3 && !got(2L)._3, "only the lowest doc_id keeps")
    assert(got(3L)._2 != got(1L)._2 && got(3L)._3)
  }

  test("m03 plan: keep-decision shuffles on the fingerprint, payload already projected away") {
    val plan = Multimodal.m03MediaHash(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(content_md5"),
      s"window exchange must key on the fingerprint:\n$plan")
    assert(!plan.contains("hashpartitioning(media"),
      s"binary payload must never be a shuffle key:\n$plan")
  }

  test("frameSampleStub keeps every stride-th complete frame") {
    val frames = frameSampleStub(rec, frameBytes = 10, stride = 3).toSeq
    assert(frames.map(_._2) == Seq(0, 3, 6, 9)) // 10 frames, every 3rd
    assert(frames.forall(_._3.length == 10))
    assert(frames.head._3.toSeq == rec.media.slice(0, 10).toSeq)
  }

  test("m02 pipeline emits one row per doc with stable checksums") {
    val out = Multimodal.m02FrameSample(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.length > 0)
    val again = Multimodal.m02FrameSample(spark, "/root/testdata/sf0.001").collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
