package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column handling: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus the decode / feature-extract /
  * frame-sample plumbing a training-data pipeline needs.
  *
  * The container ships no image/audio codecs, so the *decode kernels* are
  * STUBS — deterministic fakes clearly marked below. Everything around them
  * (schema, batch shape, partitioning, the mapPartitions seam where a real
  * vectorized decoder would sit) is real and tested. Swapping in a real
  * codec changes only the function bodies marked STUB.
  */
object Multimodal {

  /** A media row: payload + typed metadata. The `media_kind`/`meta` pair is
    * the schema contract; payload stays opaque binary end-to-end so Spark
    * never copies it through row-format conversions it doesn't need.
    */
  case class MediaRow(doc_id: Long, media_kind: String, payload: Array[Byte])
  case class DecodedMeta(doc_id: Long, media_kind: String, n_bytes: Int,
                         width: Int, height: Int, channels: Int)

  /** Deterministic media table derived from `documents`: the text bytes act
    * as the opaque payload (a stand-in for real image bytes; same plumbing).
    */
  def mediaFromDocuments(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_kind"),
      col("text").cast("binary").as("payload"))

  /** Decode metadata from the payload header.
    *
    * STUB: a real implementation would parse the container header (PNG IHDR
    * / WAV fmt / MP4 moov) via a codec library; this deterministic fake
    * derives plausible dimensions from the payload length so the schema and
    * plan shape are exercised. Column expressions only → codegen'd,
    * columnar, no serialization cliff.
    */
  def decodeMeta(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"), col("media_kind"),
      length(col("payload")).as("n_bytes"),
      (length(col("payload")) % 640 + 16).as("width"),       // STUB dimensions
      (length(col("payload")) % 480 + 16).as("height"),      // STUB dimensions
      when(col("media_kind") === "image", 3).otherwise(1).as("channels"))

  /** Feature extraction over the payload: fixed-width float vector.
    *
    * STUB kernel: md5-prefix hash of byte slices instead of a CNN/fbank
    * feature (md5 rather than crc32 so the fake is reproducible in any
    * engine → DuckDB-oracle-able). The *shape* is the real thing: binary in
    * → Array[Float] out, one row per media item, pure column expressions
    * (at 100 TB this is the difference between a scan and a serialization
    * storm).
    */
  def extractFeatures(media: DataFrame, dims: Int = 8): DataFrame =
    media.select(
      col("doc_id"),
      array((0 until dims).map { i =>
        ((graft.functions.TextAnalysis.md5Prefix32(substring(col("payload"), i * 16 + 1, 16)) % 1000L)
          / lit(1000.0)).cast("float")
      }: _*).as("features"))

  /** Frame sampling: split the payload into `n` fixed-stride chunks ("frames")
    * and emit one row per sampled frame — the explode pattern a video
    * pipeline uses (sample → per-frame decode → per-frame features).
    */
  def sampleFrames(media: DataFrame, n: Int = 4): DataFrame = {
    val frameCols = (0 until n).map { i =>
      struct(lit(i).as("frame_no"),
        substring(col("payload"), i * 32 + 1, 32).as("frame"))
    }
    media.select(col("doc_id"), posexplode(array(frameCols: _*)))
      .select(col("doc_id"), col("col.frame_no").as("frame_no"),
        length(col("col.frame")).as("frame_bytes"),
        // md5-prefix frame fingerprint (engine-portable, unlike crc32)
        graft.functions.TextAnalysis.md5Prefix32(col("col.frame")).as("frame_fp"))
  }

  /** The mapPartitions seam where a real batch decoder binds (the JVM-side
    * analog of a vectorized pandas-UDF decode): payloads are processed a
    * partition at a time so a native decoder could amortize init per
    * partition, not per row.
    *
    * STUB kernel inside; the batching structure is the deliverable.
    */
  def decodeBatch(spark: SparkSession, media: DataFrame): Dataset[DecodedMeta] = {
    import spark.implicits._
    media.select("doc_id", "media_kind", "payload").as[MediaRow]
      .mapPartitions { rows =>
        // real codec: initialize decoder context once per partition here
        rows.map { r =>
          val n = r.payload.length
          DecodedMeta(r.doc_id, r.media_kind, n, n % 640 + 16, n % 480 + 16,
            if (r.media_kind == "image") 3 else 1) // STUB decode
        }
      }
  }
}
