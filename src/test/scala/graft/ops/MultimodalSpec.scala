package graft.ops

import graft.SparkSuiteBase
import graft.ops.Multimodal.{decodePixelStats, encodePng, synthImage,
  synthHeight, synthWidth, PixelStats}

/** Multimodal invariants. m01/m02/m08 run a REAL `javax.imageio` PNG
  * encode + decode; these tests pin the codec roundtrip against an
  * INDEPENDENT pure-Scala evaluation of the pixel formula (no
  * BufferedImage anywhere in the reference path), plus the aHash
  * properties the m08 near-dup semantics rely on. */
class MultimodalSpec extends SparkSuiteBase {

  /** Reference implementation: pixel stats straight from the formula,
    * never touching the codec — what decodePixelStats(encodePng(...))
    * must reproduce exactly if PNG roundtrips losslessly. */
  private def refStats(pid: Long, offset: Int, perturb: Boolean): PixelStats = {
    val w = synthWidth(pid); val h = synthHeight(pid)
    var sr = 0L; var sg = 0L; var sb = 0L
    val cells = new Array[Long](64)
    for (y <- 0 until h; x <- 0 until w) {
      val p = if (perturb && x < w / 8 && y < h / 8) 40 else 0
      val r = (((pid + 1) * (x + 3) * (y + 7) + pid * 7) % 199).toInt + offset + p
      val g = (((pid + 2) * (x + 5) * (y + 11) + pid * 11) % 199).toInt + offset + p
      val b = (((pid + 3) * (x + 7) * (y + 13) + pid * 13) % 199).toInt + offset + p
      sr += r; sg += g; sb += b
      cells((y / (h / 8)) * 8 + (x / (w / 8))) += 299L * r + 587L * g + 114L * b
    }
    val total = cells.sum
    val bands = new Array[Long](4)
    for (c <- 0 until 64 if cells(c) * 64 > total) bands(c / 16) |= 1L << (c % 16)
    PixelStats(pid, w, h, sr, sg, sb, bands(0), bands(1), bands(2), bands(3))
  }

  test("PNG encode->decode recovers the synthesized pixels exactly") {
    for (pid <- Seq(0L, 1L, 2L, 3L, 7L, 41L, 499L)) {
      val got = decodePixelStats(pid,
        encodePng(synthImage(pid, offset = 0, perturb = false)))
      assert(got === refStats(pid, 0, perturb = false),
        s"codec roundtrip diverged from the formula for pid=$pid")
    }
  }

  test("decode is deterministic across repeated encodes") {
    val a = decodePixelStats(9L, encodePng(synthImage(9L, 3, perturb = true)))
    val b = decodePixelStats(9L, encodePng(synthImage(9L, 3, perturb = true)))
    assert(a === b)
  }

  test("aHash is brightness-invariant but channel sums are not") {
    // the property that makes aHash a PERCEPTUAL hash: +12 to every
    // channel shifts each cell and the mean together, so the strict
    // cross-multiplied compare is unchanged — while the sums move by
    // exactly 12 * pixel count
    for (pid <- Seq(0L, 5L, 23L)) {
      val base = decodePixelStats(pid,
        encodePng(synthImage(pid, offset = 0, perturb = false)))
      val bright = decodePixelStats(pid,
        encodePng(synthImage(pid, offset = 12, perturb = false)))
      val n = base.width.toLong * base.height
      assert((bright.phash_b0, bright.phash_b1, bright.phash_b2, bright.phash_b3)
        === ((base.phash_b0, base.phash_b1, base.phash_b2, base.phash_b3)),
        s"aHash must be brightness-invariant (pid=$pid)")
      assert(bright.sum_r === base.sum_r + 12 * n)
      assert(bright.sum_g === base.sum_g + 12 * n)
      assert(bright.sum_b === base.sum_b + 12 * n)
    }
  }

  test("hashes decorrelate across pattern ids (no degenerate LSH buckets)") {
    // the m08 scale argument: bucket load stays tiny because distinct
    // source images hash independently — a linear-gradient formula
    // failed this (measured 480-member buckets at sf0.1)
    val hashes = (0L until 200L by 5).map { pid =>
      val s = decodePixelStats(pid,
        encodePng(synthImage(pid, offset = 0, perturb = false)))
      (s.phash_b0, s.phash_b1, s.phash_b2, s.phash_b3)
    }
    assert(hashes.distinct.size >= hashes.size - 2,
      "rep images must hash (near-)uniquely")
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

  test("m02 pipeline emits one row per doc with stable checksums") {
    val out = Multimodal.m02FrameSample(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.length > 0)
    assert(rows.forall(_.getLong(1) == 3L),
      "every doc resizes to 8 rows and samples rows 0,3,6")
    val again = Multimodal.m02FrameSample(spark, "/root/testdata/sf0.001").collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("m08 corpus: block members share the rep aHash; member 4 is a near-dup") {
    // member offsets (brightness) keep the hash identical; the
    // member-4 localized perturbation moves SOME blocks' hashes by a
    // small Hamming distance > 0 somewhere in the id range
    def bandsOf(d: Long): (Long, Long, Long, Long) = {
      val rep = d - d % 5
      val s = decodePixelStats(d, encodePng(
        synthImage(rep, offset = ((d % 5) * 3).toInt, perturb = d % 5 == 4)))
      (s.phash_b0, s.phash_b1, s.phash_b2, s.phash_b3)
    }
    for (rep <- Seq(0L, 10L, 45L)) {
      assert(bandsOf(rep) === bandsOf(rep + 2),
        s"brightness-only members must share the rep hash (rep=$rep)")
    }
    def hd(a: (Long, Long, Long, Long), b: (Long, Long, Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2) +
        java.lang.Long.bitCount(a._3 ^ b._3) + java.lang.Long.bitCount(a._4 ^ b._4)
    val dists = (0L until 100L by 5).map(rep => hd(bandsOf(rep), bandsOf(rep + 4)))
    assert(dists.exists(_ > 0), "perturbation must flip bits for some block")
    assert(dists.forall(_ <= 10), s"perturbation must stay NEAR: $dists")
  }

  test("container demux samples stride-2 frames by the offset index") {
    import Multimodal.{encodeContainer, demuxStats, ContainerStats}
    val frames = (0 until 5).map(f => encodePng(synthImage(f * 3 + 1, 0, perturb = false)))
    val got = demuxStats(9L, encodeContainer(frames))
    // reference: decode the sampled frames directly — no container,
    // no index anywhere in this path
    val exp = Seq(0, 2, 4).map(f => decodePixelStats(0L, frames(f)))
    assert(got == ContainerStats(9L, 5L, 3L,
      exp.map(_.sum_r).sum, exp.map(_.sum_g).sum, exp.map(_.sum_b).sum), got)
    // garbage magic is rejected, not misread
    intercept[IllegalArgumentException] {
      demuxStats(0L, Array.fill[Byte](32)(7))
    }
  }

  test("WAV encode->decode recovers the synthesized samples exactly") {
    // reference stats straight from the formula — no ByteBuffer, no
    // RIFF anywhere in this path (the refStats discipline for audio)
    import Multimodal.{synthPcm, encodeWav, decodeWavStats, AudioStats}
    def ref(id: Long): AudioStats = {
      val n = (64 + (id % 4) * 32).toInt
      val vs = (0 until n).map(t =>
        (((id * 7 + 13) * (t + 5) * (t + 11) + id * 17) % 4001 - 2000).toInt)
      AudioStats(id, n.toLong, 8000L,
        vs.map(_.toLong).sum, vs.map(v => math.abs(v).toLong).sum,
        vs.zip(vs.drop(1)).count { case (a, b) => a.toLong * b < 0 }.toLong,
        vs.map(v => math.abs(v).toLong).max)
    }
    for (id <- Seq(0L, 1L, 2L, 3L, 17L, 5000L, 123456789L)) {
      val got = decodeWavStats(id, encodeWav(synthPcm(id), 8000))
      assert(got === ref(id), s"codec roundtrip diverged for id=$id")
    }
  }

  test("WAV decoder walks chunks (rejects garbage, skips odd-sized junk)") {
    import Multimodal.{synthPcm, encodeWav, decodeWavStats}
    // not RIFF at all
    intercept[IllegalArgumentException] {
      decodeWavStats(0L, Array.fill[Byte](64)(0x41))
    }
    // odd-sized junk chunk between fmt and data must be pad-skipped:
    // splice a 5-byte "junk" chunk (+1 pad) into a real file
    val base = encodeWav(synthPcm(7L), 8000)
    val insertAt = 12 + 8 + 16 // after fmt chunk
    val junk = java.nio.ByteBuffer.allocate(8 + 6)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("junk".getBytes("US-ASCII")).putInt(5)
      .put(Array[Byte](1, 2, 3, 4, 5, 0)).array()
    val spliced = base.take(insertAt) ++ junk ++ base.drop(insertAt)
    // fix the RIFF size field
    val bb = java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, bb.getInt(4) + junk.length)
    assert(decodeWavStats(7L, spliced) ===
      decodeWavStats(7L, base), "odd-size junk chunk broke the walk")
    // stereo/wrong-bits headers must be rejected, not misread
    val bad = base.clone()
    val fb = java.nio.ByteBuffer.wrap(bad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    fb.putShort(12 + 8 + 2, 2.toShort) // channels := 2
    intercept[IllegalArgumentException] { decodeWavStats(7L, bad) }
  }

  test("JPEG lossy roundtrip stays inside the bucket tolerance on every quadrant") {
    import graft.ops.Multimodal._
    // sweep a spread of ids covering both sizes and all residues mod 15
    (0L until 64L).foreach { id =>
      val img = synthGrayQuad(id)
      val stats = decodeJpegQuadStats(id, encodeJpeg(img))
      val side = (16L * (1L + id % 2)).toInt
      assert(stats.width == side && stats.height == side)
      val expect = Array((id * 3 + 1) % 15, (id * 5 + 2) % 15,
        (id * 7 + 4) % 15, (id * 11 + 8) % 15)
      assert(Seq(stats.q00, stats.q01, stats.q10, stats.q11) ==
        expect.toSeq, s"bucket drift for id $id")
      // and the per-pixel DC error really is small (the budget the
      // bucket width rests on): flat MCUs decode within a few levels
      val dec = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(encodeJpeg(img)))
      var worst = 0
      var y = 0
      while (y < side) {
        var x = 0
        while (x < side) {
          val d = math.abs(dec.getRaster.getSample(x, y, 0) -
            img.getRaster.getSample(x, y, 0))
          if (d > worst) worst = d
          x += 1
        }
        y += 1
      }
      assert(worst <= 6, s"per-pixel JPEG error $worst exceeds budget for id $id")
    }
  }
}
