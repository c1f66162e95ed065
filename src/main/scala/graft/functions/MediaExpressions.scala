package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType, StructField, StructType}

import graft.multimodal.Codecs

/** Native media-decode expressions: the SQL surface of the codec tier
  * (binary payload → decoded-statistics struct), so `spark.sql` users
  * reach the from-scratch decoders exactly like the winnow/quality
  * functions — no Dataset round-trip, no UDF registration.
  *
  * CodegenFallback is deliberate, as for the sketch expressions: the
  * per-row codec kernel is already compiled JVM code; fusing it into
  * WholeStageCodegen would buy nothing. A malformed payload fails
  * loudly (the codecs' contract) rather than decoding silently wrong.
  */

/** `graft_image_stats(content)`: decode an image payload — container
  * sniffed from its magic (P6 PPM, PNG signature, GIF8 header, or JPEG
  * SOI), so the caller never declares the format — and emit the
  * q151/q164/q169/q170 statistics struct. The struct fields mirror
  * [[graft.multimodal.Multimodal.ImageStats]] minus the id (the
  * caller already has its key column).
  */
case class ImageStatsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_pixels", LongType, nullable = false),
    StructField("sum_channel", LongType, nullable = false),
    StructField("sum_channel_sq", LongType, nullable = false),
    StructField("max_channel", IntegerType, nullable = false),
    StructField("mean_channel", DoubleType, nullable = false)))

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val img =
      if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6')
        Codecs.decodePpm(bytes)
      else if (bytes.length >= 4 && bytes(0) == 'G' && bytes(1) == 'I' &&
          bytes(2) == 'F' && bytes(3) == '8')
        Codecs.decodeGif(bytes)
      else if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFF &&
          (bytes(1) & 0xFF) == 0xD8)
        Codecs.decodeJpeg(bytes)
      else Codecs.decodePng(bytes)
    var sum = 0L; var sumSq = 0L; var mx = 0; var i = 0
    while (i < img.pixels.length) {
      val v = img.pixels(i) & 0xFF
      sum += v; sumSq += v.toLong * v; if (v > mx) mx = v
      i += 1
    }
    val n = img.width.toLong * img.height
    InternalRow(img.width, img.height, n, sum, sumSq, mx,
      sum.toDouble / (3.0 * n))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_audio_stats(content)`: decode an audio payload — container
  * sniffed from its magic (RIFF/WAVE PCM16 chunk walk, or a `fLaC`
  * stream through the Rice/predictor decode) — and emit the q152
  * statistics struct; duration comes from the rate/channels READ FROM
  * the parsed header, so a mis-decode surfaces as a wrong duration
  * here exactly as in the Dataset path.
  */
case class AudioStatsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_samples", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("sum_sample", LongType, nullable = false),
    StructField("min_sample", LongType, nullable = false),
    StructField("max_sample", LongType, nullable = false)))

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val wav =
      if (bytes.length >= 4 && bytes(0) == 'f' && bytes(1) == 'L' &&
          bytes(2) == 'a' && bytes(3) == 'C')
        Codecs.decodeFlac(bytes)
      else Codecs.decodeWav(bytes)
    var sum = 0L; var mn = 0L; var mx = 0L; var i = 0
    if (wav.samples.nonEmpty) { mn = Long.MaxValue; mx = Long.MinValue }
    while (i < wav.samples.length) {
      val v = wav.samples(i).toLong
      sum += v; if (v < mn) mn = v; if (v > mx) mx = v
      i += 1
    }
    val n = wav.samples.length.toLong
    InternalRow(n, n * 1000L / (wav.sampleRate.toLong * wav.channels),
      sum, mn, mx)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
