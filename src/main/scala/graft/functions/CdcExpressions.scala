package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking as a native expression — the production
  * tier of the CDC kernel (q193/q194). The retired Catalyst-composed
  * tier evaluated an md5 over the trailing 8-char window at EVERY text
  * position (`transform(sequence(1,n))` — a multiplicative map cost on
  * the whole corpus at 100 TB); this computes the same
  * boundary-detection shape with a Rabin-style polynomial rolling hash:
  * ONE multiply/add (plus one subtract for the outgoing character) per
  * character, a single pass per row.
  *
  * Boundary rule (portable — the DuckDB oracles compute it per-position
  * with nested Horner arithmetic, same polynomial): a cut falls AFTER
  * 1-based code-point position i (i ≥ 8) exactly when
  *
  *   H(i) = Σ_{k=0..7} cp(i-7+k) · B^(7-k)  mod M   ≡ 0  (mod 64)
  *
  * with B = 257, M = 1e9+7 (prime; keeps every intermediate within a
  * signed 64-bit product), window = trailing 8 Unicode code points,
  * bucket 64 → expected chunk ≈ 64 chars. Positions and chunk lengths
  * are in code points (`substr`/`len` semantics in both engines).
  *
  * Output: array<struct<l: long, ck: long>> — chunk length and
  * xxhash64(chunk text, seed 42), bit-identical to
  * `xxhash64(substr(text, ...))` on the same chunk, so chunk identity
  * still crosses corpus-scale Exchanges as an 8-byte key and the
  * oracles keep grouping their own substrings (q101's discipline).
  *
  * CodegenFallback is deliberate (the graft_image_stats pattern): the
  * per-row loop is already one tight compiled pass; fusing it into
  * WholeStageCodegen would buy nothing.
  */
case class CdcChunksExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  import CdcChunksExpr._

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("l", LongType, nullable = false),
      StructField("ck", LongType, nullable = false))),
    containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val win = new Array[Long](8) // last 8 code points, circular
    var h = 0L // polynomial hash of the trailing min(cp, 8) code points
    var cp = 0 // code points consumed so far
    var chunkStartChar = 0 // char (UTF-16) offset of the open chunk
    var chunkStartCp = 0 // code-point offset of the open chunk
    var charIdx = 0
    while (charIdx < s.length) {
      val c = s.codePointAt(charIdx)
      val cw = Character.charCount(c)
      val slot = cp & 7
      h = (h * B + c) % M
      if (cp >= 8) { // retire the code point that left the window
        h = (h - win(slot) * B8) % M
        if (h < 0) h += M
      }
      win(slot) = c
      cp += 1
      charIdx += cw
      if (cp >= 8 && h % 64L == 0L) { // cut AFTER position cp
        out += chunkRow(s, chunkStartChar, charIdx, cp - chunkStartCp)
        chunkStartChar = charIdx
        chunkStartCp = cp
      }
    }
    if (cp > chunkStartCp) // the tail chunk (or the whole short text)
      out += chunkRow(s, chunkStartChar, charIdx, cp - chunkStartCp)
    new GenericArrayData(out.toArray)
  }

  private def chunkRow(s: String, fromChar: Int, toChar: Int,
      lenCp: Int): InternalRow = {
    val ck = XxHash64Function.hash(
      UTF8String.fromString(s.substring(fromChar, toChar)), StringType, 42L)
    InternalRow(lenCp.toLong, ck)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcChunksExpr {
  val B = 257L
  val M = 1000000007L
  /** B^8 mod M — the outgoing character's coefficient after the
    * incoming multiply.
    */
  val B8: Long = {
    var p = 1L
    var k = 0
    while (k < 8) { p = p * B % M; k += 1 }
    p
  }

  /** The boundary polynomial as per-position DuckDB SQL (nested Horner
    * with a mod at every step — no intermediate exceeds M·B + 0x10FFFF,
    * well inside BIGINT): `hornerSql("w")` hashes the 8-char string
    * column/alias `w`. Shared by the q193/q194 oracles so both engines
    * define cuts from the SAME polynomial.
    */
  def hornerSql(w: String): String =
    (1 to 8).foldLeft("CAST(0 AS BIGINT)") { (acc, k) =>
      s"(($acc * $B + ord(substr($w, $k, 1))) % $M)"
    }
}
