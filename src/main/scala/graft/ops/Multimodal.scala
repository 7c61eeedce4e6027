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

  /** Extracted features; fixed-width vector (here 3 dims). */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, f0: Double, f1: Double, f2: Double)

  /** STUB — stands in for an image/audio decode + feature extraction
    * (??? in a real deployment: JPEG decode, resample, model forward).
    * Deterministic function of the bytes so the pipeline is testable. */
  def stubDecode(r: MediaRecord): MediaFeatures = {
    val bytes = r.media
    val sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
    MediaFeatures(
      doc_id = r.doc_id,
      n_bytes = bytes.length.toLong,
      f0 = r.width.toDouble / math.max(r.height, 1),
      f1 = (bytes.headOption.map(_ & 0xff).getOrElse(0)).toDouble / 255.0,
      f2 = math.round(sum.toDouble / math.max(bytes.length, 1)) / 255.0)
  }

  /** m01 — end-to-end multimodal pipeline over fake media: documents'
    * text bytes stand in for blobs, width/height metadata is derived
    * deterministically, decode runs batchwise per partition, features
    * aggregate downstream. */
  def m01MediaFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables(s, dir, "documents")
      .select($"doc_id",
        encode($"text", "UTF-8").as("media"),
        (pmod(xxhash64($"text"), lit(640)) + 1).cast("int").as("width"),
        (pmod(xxhash64($"text", lit(1)), lit(480)) + 1).cast("int").as("height"))
      .as[MediaRecord]
    // Batch shape: one iterator per partition — a JNI/py decoder would
    // amortize model/codec init across the partition exactly here.
    media.mapPartitions(_.map(stubDecode))
      .toDF()
      .select($"doc_id", $"n_bytes",
        round($"f0", 4).as("f0"), round($"f1", 4).as("f1"), round($"f2", 4).as("f2"))
      .orderBy($"doc_id")
  }
}
