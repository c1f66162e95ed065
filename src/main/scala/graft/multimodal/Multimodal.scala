package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata.
  *
  * The Spark-side machinery — schema, partition-friendly batch iteration,
  * deterministic metadata extraction — is real and tested. The actual
  * codec work (JPEG decode, resampling, frame extraction) is STUBBED:
  * no image/audio libraries exist in this container, so `decodeStub`
  * derives metadata purely from the bytes (length, first byte, digest).
  * Swapping in a real decoder only replaces the function body; the plan
  * shape (scan → per-partition batch transform → typed output) is final.
  */
object Multimodal {

  /** A media row: opaque payload + envelope metadata. */
  case class MediaRow(media_id: Long, media_type: String, content: Array[Byte])

  /** Decoded (stub) features. With a real codec, width/height/duration
    * come from the payload header; here they are deterministic functions
    * of the bytes so tests and oracles can predict them.
    */
  case class MediaMeta(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      first_byte: Int,
      content_md5: String)

  /** STUB decode: deterministic byte-level features standing in for a real
    * codec. Runs per-partition over iterator batches — the Scala analog of
    * a vectorized (mapInPandas-style) UDF: one JVM-side loop per partition,
    * no per-row closure dispatch overhead in the hot path beyond the row
    * itself.
    */
  def decodeStub(rows: Iterator[MediaRow]): Iterator[MediaMeta] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.map { r =>
      val bytes = if (r.content == null) Array.emptyByteArray else r.content
      md.reset()
      val digest = md.digest(bytes).map("%02x".format(_)).mkString
      MediaMeta(
        media_id = r.media_id,
        media_type = r.media_type,
        n_bytes = bytes.length.toLong,
        first_byte = if (bytes.isEmpty) -1 else bytes(0) & 0xFF,
        content_md5 = digest)
    }
  }

  /** Typed per-partition decode over a media Dataset. */
  def extractMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(decodeStub)
  }

  /** Deterministic frame-sampling plan for a video payload: byte offsets of
    * every `stride`-th frame given a (stubbed) fixed frame size. Pure
    * arithmetic on metadata — real decoders replace offset math with
    * container parsing, the plan stays a per-row generator.
    */
  def frameOffsets(nBytes: org.apache.spark.sql.Column, frameSize: Int, stride: Int):
      org.apache.spark.sql.Column = {
    val allFrames =
      when(nBytes >= frameSize,
        transform(sequence(lit(0L), (nBytes / frameSize).cast("long") - 1),
          i => i * frameSize))
        .otherwise(array().cast("array<bigint>"))
    filter(allFrames, off => (off / frameSize) % stride === 0)
  }

  /** Build a media table from any text corpus (UTF-8 payloads) — the test
    * harness for the plumbing while real binaries are unavailable.
    */
  def mediaFromText(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col(idCol).cast("long").as("media_id"),
      lit("text/plain").as("media_type"),
      encode(col(textCol), "UTF-8").as("content"))
      .as[MediaRow]
  }
}
