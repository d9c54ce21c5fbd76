package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column support: image/audio/video payloads ride through the
  * engine as opaque `binary` columns with typed metadata. The Spark-side
  * plumbing (schema, partition-preserving batch decode via
  * `mapPartitions`, metadata extraction as pure expressions) is real and
  * tested; the actual media decode is STUBBED with a deterministic fake
  * (no image/audio libraries in this environment) behind
  * [[Multimodal.decodeStub]] — swap that one function for a real decoder
  * (JavaCV, TwelveMonkeys, ffmpeg-pipe) in production.
  */
object Multimodal {

  /** One media payload. `payload` is the opaque binary column. */
  case class MediaRecord(media_id: Long, media_type: String, payload: Array[Byte])

  /** Decoded per-media features (what a real decoder would emit). */
  case class MediaFeatures(media_id: Long, media_type: String, byte_len: Long,
                           width: Int, height: Int, n_frames: Int)

  /** Pure-expression metadata over a binary column — byte length, header
    * prefix and content hash; runs codegen'd inside the scan.
    * (DuckDB has no md5(BLOB), so the content hash is md5 of the
    * uppercase hex — portable.)
    */
  def withBinaryMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("byte_len", octet_length(col(binCol)).cast("long"))
      .withColumn("header_hex", upper(substring(hex(col(binCol)), 1, 16)))
      .withColumn("content_md5", md5(upper(hex(col(binCol)))))

  /** STUB — deterministic fake decode standing in for a real media
    * decoder. Derives "dimensions" from the payload hash so tests are
    * reproducible. Replace the body (only) with a real decode to go to
    * production; signature and batching stay the same.
    */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val h = java.security.MessageDigest.getInstance("MD5").digest(r.payload)
    def b(i: Int) = h(i) & 0xff
    MediaFeatures(r.media_id, r.media_type, r.payload.length.toLong,
      width = 16 * (1 + b(0) % 64), height = 16 * (1 + b(1) % 64),
      n_frames = if (r.media_type == "video") 1 + b(2) % 240 else 1)
  }

  /** Batch feature extraction: partition-preserving `mapPartitions` so a
    * real decoder can amortize per-batch setup (model load, ffmpeg
    * process) exactly like a Pandas-UDF batch would.
    */
  def decodeFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it => it.map(decodeStub) }
  }

  /** Frame sampling plumbing for video-like payloads: emit every
    * `stride`-th frame index up to `n_frames` (the decode stub's frame
    * count), as (media_id, frame_idx) — the shape a real frame extractor
    * would fan out to.
    */
  def sampleFrames(features: Dataset[MediaFeatures], stride: Int): DataFrame =
    features.toDF().select(col("media_id"),
      explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
}
