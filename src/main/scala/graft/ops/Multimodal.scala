package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (builder-prompt first-class component):
  * image/audio/video ride as opaque `binary` columns with typed
  * metadata; decode / feature-extract runs batchwise inside
  * `mapPartitions` on a typed Dataset — the Scala analogue of a Pandas
  * UDF over `mapInPandas` (same contract: an iterator of batches in,
  * an iterator of batches out; a Python decoder would slot into the
  * identical pipeline shape via mapInPandas).
  *
  * The actual codec is STUBBED (no image/audio libraries in this
  * container — builder prompt): [[stubDecode]] derives deterministic
  * fake features from the bytes. Everything around it — schema, binary
  * encoding, metadata struct, partition-batched execution, downstream
  * aggregation — is real and tested.
  *
  * Scale notes: binary payloads dominate row size -> keep them OUT of
  * shuffles (feature-extract before any wide op, as here), size
  * `spark.sql.files.maxPartitionBytes` so a partition of blobs fits in
  * executor memory, and store real corpora as parquet binary columns
  * with metadata in sidecar columns for pushdown-based sampling.
  */
object Multimodal {

  /** One media row: payload + typed metadata. */
  case class MediaRecord(doc_id: Long, media: Array[Byte], width: Int, height: Int)

  /** Extracted features. Every field is an EXACT function of the
    * payload bytes and integer metadata (byte length, integer aspect
    * ratio in permille-of-10000, first byte value, md5 fingerprint) —
    * no float arithmetic anywhere, so the whole m01 pipeline is
    * bit-reproducible AND independently recomputable by the DuckDB
    * oracle (the m03 argument: the fake payload is the document's
    * UTF-8 bytes, which DuckDB hashes/measures identically from the
    * VARCHAR side). r13 verdict: this flips m01 from rows-only to
    * hash-exact while keeping the stub-for-real-codec framing. */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, aspect_pm: Long,
      first_byte: Int, content_md5: String)

  /** STUB — stands in for an image/audio decode + feature extraction
    * (??? in a real deployment: JPEG decode, resample, model forward).
    * Deterministic INTEGER/digest function of the bytes + metadata so
    * the pipeline is testable and oracle-mirrorable: byte length,
    * width*10000 div height (integer aspect), first byte value, and
    * the md5 fingerprint. */
  def stubDecode(r: MediaRecord): MediaFeatures = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(r.media).map(b => f"${b & 0xff}%02x").mkString
    MediaFeatures(
      doc_id = r.doc_id,
      n_bytes = r.media.length.toLong,
      aspect_pm = r.width.toLong * 10000L / math.max(r.height, 1),
      first_byte = if (r.media.isEmpty) 0 else r.media.head & 0xff,
      content_md5 = hex)
  }

  /** STUB — stands in for an image resize (??? in a real deployment:
    * decode, scale, re-encode). Deterministic: output byte length
    * scales with the target area so downstream size accounting is
    * testable, via pure INTEGER arithmetic (len * targetArea div
    * srcArea — truncating long division, which any SQL engine
    * reproduces exactly; the earlier float `math.round` phrasing was
    * the one step a DuckDB mirror could not pin). Metadata is updated
    * alongside the payload — the invariant a real resize must keep. */
  def resizeStub(r: MediaRecord, targetW: Int, targetH: Int): MediaRecord = {
    if (r.media.isEmpty) return MediaRecord(r.doc_id, r.media, targetW, targetH)
    val outLen = math.max(1L,
      r.media.length.toLong * targetW * targetH /
        (r.width.toLong * r.height)).toInt
    val out = Array.tabulate[Byte](outLen)(i => r.media(i % r.media.length))
    MediaRecord(r.doc_id, out, targetW, targetH)
  }

  /** STUB — stands in for video frame sampling: the payload is treated
    * as a sequence of fixed-size frames; every `stride`-th frame is
    * kept (??? in a real deployment: container demux + keyframe
    * select). Returns (doc_id, frame_idx, frame_bytes) rows — the
    * explode shape a caption/embedding stage consumes. */
  def frameSampleStub(r: MediaRecord, frameBytes: Int, stride: Int)
      : Iterator[(Long, Int, Array[Byte])] = {
    val nFrames = r.media.length / frameBytes
    Iterator.range(0, nFrames).filter(_ % stride == 0).map { i =>
      (r.doc_id, i, r.media.slice(i * frameBytes, (i + 1) * frameBytes))
    }
  }

  private[graft] def fakeMedia(s: SparkSession, dir: String) = {
    import s.implicits._
    // width/height derive from the BYTE LENGTH (affine mod — varied but
    // deterministic), not from xxhash64 as before r14: the oracle can
    // recompute strlen-based metadata but has no Spark-compatible
    // xxhash64, and this derivation is what flips m01/m02 from
    // rows-only to hash-exact (r13 verdict item 2)
    Tables(s, dir, "documents")
      .select($"doc_id",
        encode($"text", "UTF-8").as("media"),
        (pmod(octet_length($"text") * 7 + 13, lit(640)) + 1)
          .cast("int").as("width"),
        (pmod(octet_length($"text") * 11 + 29, lit(480)) + 1)
          .cast("int").as("height"))
      .as[MediaRecord]
  }

  /** m02 — resize + frame-sample pipeline: every doc's fake media is
    * resized to 64x64 then sampled every 3rd 16-byte "frame"; output
    * is per-doc sampled-frame count + a deterministic checksum. The
    * flatMap inside mapPartitions is the demux shape: one input row
    * fans out to frame rows without materializing all frames per doc.
    *
    * The checksum is a bit_xor fold of each frame's md5 prefix (first
    * 15 hex digits = 60 bits, parsed as a long on both engines) — an
    * order-insensitive digest the DuckDB oracle reconstructs by
    * re-tiling the text with repeat/substr and re-framing it with
    * generate_series (every stage of the resize+demux is integer
    * arithmetic over ASCII bytes, so the VARCHAR mirror is
    * byte-exact). Docs whose resized payload yields no complete frame
    * produce no row — on both sides. */
  def m02FrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    fakeMedia(s, dir)
      .mapPartitions(_.flatMap(r =>
        frameSampleStub(resizeStub(r, 64, 64), frameBytes = 16, stride = 3)))
      .toDF("doc_id", "frame_idx", "frame")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_frames"),
        // xor-fold, not sum: hash sums overflow LongType under ANSI
        // mode; 15 hex md5 digits = 60 bits, safely inside a long
        expr("bit_xor(cast(conv(substring(md5(frame), 1, 15), 16, 10) as bigint))")
          .as("frames_checksum"))
      .orderBy($"doc_id")
  }

  /** m03 — binary-payload content fingerprinting + exact media dedup:
    * md5 over the raw `binary` column with a first-occurrence keep
    * decision — the image/audio dedup pass a multimodal pipeline runs
    * BEFORE any decode (bit-identical assets are the dominant
    * duplication mode in scraped media, and hashing bytes needs no
    * codec — so unlike m01/m02 nothing here is stubbed, making this
    * the multimodal family's first fully oracle-checked query: the
    * fake media IS the documents' UTF-8 bytes, which DuckDB's md5
    * hashes identically from the VARCHAR side).
    *
    * Scale shape: the fingerprint projection is a pure map over the
    * blob scan; the keep-decision window shuffles (doc_id, 16-byte
    * hex, n_bytes) — the PAYLOAD never shuffles (the Multimodal
    * header rule: binary stays out of every wide op). At 100 TB the
    * md5 column is what lands in the asset catalog; dedup joins
    * against it, not the bytes. */
  def m03MediaHash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"content_md5").orderBy($"doc_id")
    fakeMedia(s, dir).toDF()
      .select($"doc_id", length($"media").cast("long").as("n_bytes"),
        md5($"media").as("content_md5"))
      .withColumn("keep", row_number().over(w) === 1)
      .orderBy($"doc_id")
  }

  /** Materialize the fake media as a REAL parquet asset table — the
    * payload as a parquet `binary` column, metadata (width, height,
    * n_bytes) as sidecar columns — under java.io.tmpdir, one table per
    * source dir. This is the storage layout the header note prescribes
    * for 100 TB corpora; m04 proves the claimed benefit on it. */
  private[graft] def mediaParquet(s: SparkSession, dir: String): String = {
    // Layout.tag: 64-bit MD5 prefix of the source dir — the shared
    // collision-safe suffix (a 32-bit String.hashCode tag could serve
    // one dir's media copy for another; ADVICE round 7)
    val path = Layout.tmpPath("media", dir)
    Layout.sweepStaleFor("media", dir)
    fakeMedia(s, dir).toDF()
      .withColumn("n_bytes", length(col("media")).cast("long"))
      .write.mode("overwrite").parquet(path)
    path
  }

  /** m04 — metadata-pushdown sampling proof: filter + aggregate the
    * asset table on METADATA ONLY. The parquet scan must read just the
    * sidecar columns — ReadSchema excludes the `media` payload and the
    * n_bytes predicate reaches PushedFilters (PlanAuditSpec asserts
    * both on this exact scan) — so at 100 TB a metadata sample costs
    * megabytes of column chunks, not the corpus. This turns the header
    * note's "sidecar columns for pushdown-based sampling" from prose
    * into a tested property; the DuckDB oracle recomputes the buckets
    * from strlen(text) (the fake payload IS the documents' UTF-8
    * bytes, the m03 argument). */
  def m04MetadataPushdown(s: SparkSession, dir: String): DataFrame =
    m04Scan(s, mediaParquet(s, dir))

  /** The metadata-only scan m04 runs and PlanAuditSpec audits. */
  private[graft] def m04Scan(s: SparkSession, path: String): DataFrame = {
    import s.implicits._
    s.read.parquet(path)
      .filter($"n_bytes" >= 64)
      .select(expr("n_bytes div 256").as("bucket"), $"n_bytes")
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_docs"), sum($"n_bytes").as("sum_bytes"),
        min($"n_bytes").as("min_bytes"), max($"n_bytes").as("max_bytes"))
      .orderBy($"bucket")
  }

  /** m05 — metadata-GATED multimodal retrieval: ANN over only the
    * assets whose sidecar metadata passes a predicate — the
    * multimodal search shape at 100 TB ("find similar images at
    * least this large"): the cheap, pushdown-pruned metadata scan
    * shrinks the candidate set BEFORE any embedding math, and the
    * binary payload is never read at all (the m04 property carried
    * through a whole retrieval pipeline; PlanAuditSpec asserts no
    * ReadSchema in the final plan contains the payload column).
    * Candidates then rank by the fused native cosine kernel with the
    * s01 top-k shape ([[graft.Graft.cosineTopK]]: corpus-side scan +
    * broadcast queries — no corpus shuffle). The embedding join is
    * un-hinted: AQE broadcasts the surviving doc_id set at harness
    * scale and falls back to a hash join when the filter passes
    * millions of assets. */
  def m05MetaAnn(s: SparkSession, dir: String): DataFrame =
    m05Rank(s, mediaParquet(s, dir), Tables(s, dir, "embeddings"))

  /** The gated ranking stage PlanAuditSpec audits. */
  private[graft] def m05Rank(s: SparkSession, path: String,
      emb: DataFrame): DataFrame = {
    import s.implicits._
    val passing = s.read.parquet(path)
      .filter($"n_bytes" >= 64).select($"doc_id")
    val corpus = emb.join(passing, emb("vec_id") === col("doc_id"))
      .select($"vec_id", $"embedding")
    val queries = emb.filter($"vec_id" < 10).select($"vec_id", $"embedding")
    graft.Graft.cosineTopK(corpus, queries, 5)
      .select($"query_id", $"rank", $"vec_id", round($"cos", 6).as("cos"))
      .orderBy($"query_id", $"rank")
  }

  /** m06 — composed MEDIA CURATION: the c01 discipline applied to the
    * asset table — metadata gate (payload size bounds, evaluated on
    * the sidecar column so the pushdown-pruned scan never reads the
    * binary), exact content dedup (m03's md5 keep-first — the
    * dominant scraped-media duplication mode), a language join
    * against the document table, and a per-language corpus report.
    * The m-family's composition row: every stage is proven in
    * isolation (m03/m04 + d01's keep-first shape); this pins the
    * CHAIN as one plan, payload untouched end to end (the only
    * payload read is the md5 projection — at rest that hash lives in
    * the asset catalog and even this pass disappears).
    *
    * Oracle-exact via the m03 argument (fake payload = the document's
    * UTF-8 bytes, so DuckDB md5's the VARCHAR and strlen's the bytes
    * to identical effect). Integer-only report. */
  def m06MediaCuration(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"content_md5").orderBy($"doc_id")
    val kept = s.read.parquet(mediaParquet(s, dir))
      .filter($"n_bytes".between(200, 2000))
      .select($"doc_id", $"n_bytes", md5($"media").as("content_md5"))
      .withColumn("__rn", row_number().over(w))
      .filter($"__rn" === 1)
    kept.join(Tables(s, dir, "documents").select($"doc_id", $"lang"), "doc_id")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_assets"),
        sum($"n_bytes").as("sum_bytes"),
        min($"doc_id").as("min_doc"))
      .orderBy($"lang")
  }

  /** m01 — end-to-end multimodal pipeline over fake media: documents'
    * text bytes stand in for blobs, width/height metadata is derived
    * deterministically, decode runs batchwise per partition. Every
    * emitted feature is integer/digest-exact (see [[MediaFeatures]]),
    * so the DuckDB oracle recomputes the whole row from the text —
    * the m-family's former rows-only check is now hash-exact. */
  def m01MediaFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Batch shape: one iterator per partition — a JNI/py decoder would
    // amortize model/codec init across the partition exactly here.
    fakeMedia(s, dir).mapPartitions(_.map(stubDecode))
      .toDF()
      .select($"doc_id", $"n_bytes", $"aspect_pm", $"first_byte",
        $"content_md5")
      .orderBy($"doc_id")
  }

  /** Stage a directory of standalone binary files — the object-store
    * landing zone a multimodal pipeline ingests from (one blob per
    * asset, id in the filename). The payload is the documents' UTF-8
    * bytes (the m03 argument), one file per doc of the % 10 == 3
    * slice, staged once per (JVM, source dir) under the Layout tag
    * with a `_SUCCESS` guard + stale-sibling sweep. The driver-side
    * write is FIXTURE staging (standing in for the store), not the
    * operator — the operator is [[m07BinaryIngest]]'s distributed
    * scan. */
  private[graft] def mediaFiles(s: SparkSession, dir: String): String = {
    import s.implicits._
    val path = Layout.tmpPath("m07bin", dir)
    val root = new java.io.File(path)
    if (!new java.io.File(root, "_SUCCESS").exists()) {
      Layout.sweepStaleFor("m07bin", dir)
      root.mkdirs()
      Tables(s, dir, "documents").filter($"doc_id" % 10 === 3)
        .select($"doc_id", $"text").as[(Long, String)].collect()
        .foreach { case (id, t) =>
          java.nio.file.Files.write(
            new java.io.File(root, f"doc_$id%08d.bin").toPath,
            t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
      new java.io.File(root, "_SUCCESS").createNewFile()
    }
    path
  }

  /** m07 — `binaryFile`-source ingestion: the raw-asset scan that
    * turns a directory of blobs into the (id, size, fingerprint) rows
    * an asset catalog starts from — the step BEFORE m03's
    * parquet-resident dedup. `pathGlobFilter` prunes non-asset files
    * at listing time (the `_SUCCESS` marker never reaches a task);
    * the id parses from the filename; `length` comes from file-status
    * metadata; the content bytes feed ONLY the md5 projection.
    *
    * Scale shape: the scan is one task per file-split group
    * (`maxPartitionBytes` caps blobs per task, the header note's
    * sizing rule), embarrassingly parallel, no shuffle anywhere —
    * the final ORDER BY sorts the slice's few catalog rows. The
    * oracle recomputes size and md5 from the documents' text (the
    * payload IS those UTF-8 bytes), so a hash match proves the
    * file roundtrip is content-exact. */
  def m07BinaryIngest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin")
      .load(mediaFiles(s, dir))
      .select(
        regexp_extract($"path", "doc_(\\d+)\\.bin$", 1).cast("long")
          .as("doc_id"),
        $"length".as("n_bytes"),
        md5($"content").as("payload_md5"))
      .orderBy($"doc_id")
  }

  /** m08 — media near-duplicate detection by banded perceptual-hash
    * Hamming search: the image/video counterpart of text near-dup
    * (d07), and the multimodal-curation op a media lake runs daily
    * (re-posts, mirrors, re-encodes of the same asset). The
    * perceptual hash is STUBBED (??? in a real deployment: pHash/dHash
    * over decoded pixels) as the top 60 bits of md5 over the payload
    * bytes — deterministic, DuckDB-mirrorable (the m02/m03 digest
    * discipline), and sharing the defining property the pipeline
    * exercises: identical payloads hash identically. The corpus is
    * shaped like a re-post lake: blocks of 5 doc_ids share one
    * payload (a self-join against the block representative), so true
    * near-dup pairs exist at every SF.
    *
    * Pipeline (the REAL part, stub-independent): the 60-bit hash
    * bands into 4 x 15 bits; candidates gather per (band, value)
    * bucket with the d07 join-free collect_list discipline (sorted,
    * 64-cap — bucket load here is ~5 x Poisson(|payloads|/2^15),
    * far under the cap through sf0.1; production raises bands/bits
    * before the cap bites, the d07 argument); in-bucket i<j pair
    * expansion, cross-band DISTINCT, then the exact
    * `bit_count(a ^ b) <= 2` Hamming verify touches candidates only —
    * no all-pairs scan exists at any scale. Digest output (per
    * Hamming distance: pair count + id sums) keeps rows O(threshold)
    * at every SF. */
  def m08NearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val reps = Tables(s, dir, "documents")
      .select($"doc_id".as("rep_id"), encode($"text", "UTF-8").as("media"))
    val assets = Tables(s, dir, "documents")
      .select($"doc_id", ($"doc_id" - $"doc_id" % 5).as("rep_id"))
      .join(reps, "rep_id")
      .select($"doc_id",
        expr("cast(conv(substring(md5(media), 1, 15), 16, 10) as bigint)")
          .as("phash"))
    val bands = assets.select($"doc_id", $"phash",
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("b"),
            shiftright($"phash", 15 * b).bitwiseAND(lit(0x7FFFL))
              .as("v"))): _*)).as("bd"))
      .select($"doc_id", $"phash", $"bd.b", $"bd.v")
    val buckets = bands.groupBy($"b", $"v")
      .agg(slice(sort_array(collect_list(struct($"doc_id", $"phash"))),
        1, 64).as("ms"))
      .filter(size($"ms") >= 2)
    val pairs = buckets.select(explode(expr(
        """flatten(transform(ms, (x, i) ->
          |  transform(slice(ms, i + 2, size(ms)),
          |    y -> named_struct('a', x.doc_id, 'ah', x.phash,
          |                      'b2', y.doc_id, 'bh', y.phash))))"""
          .stripMargin)).as("p"))
      .select($"p.a", $"p.ah", $"p.b2", $"p.bh")
      .distinct()
    pairs
      .withColumn("hd", expr("bit_count(ah ^ bh)").cast("long"))
      .filter($"hd" <= 2)
      .groupBy($"hd")
      .agg(count(lit(1)).as("n_pairs"),
        sum($"a").as("sum_a"), sum($"b2").as("sum_b"))
      .orderBy($"hd")
  }
}
