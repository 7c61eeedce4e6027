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
    assert(f1.f0 == 1.0) // width/height
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
