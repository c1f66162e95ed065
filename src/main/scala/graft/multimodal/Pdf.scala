package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal.MediaRow

/** From-scratch PDF STRUCTURAL layer (ISO 32000 subset): the document
  * container a multimodal crawl actually holds next to images and
  * audio. Synthesis writes genuine single-page PDFs — header, four
  * indirect objects (catalog → pages → page → content stream), a
  * cross-reference table with exact 20-byte entries, trailer,
  * `startxref` — and the walk REALLY reads them the way a PDF reader
  * does: find `startxref` from the end, parse the xref table, resolve
  * every in-use object AT ITS DECLARED OFFSET (a lying entry is caught
  * at the object header, never silently re-synced), slice each stream
  * by its `/Length`, and inflate `/FlateDecode` streams through the
  * engine's own RFC 1950 zlib walk ([[graft.web.Deflate]] — the same
  * proven inflate behind PNG and the HTTP deflate coding).
  *
  * Subset contract (all checked loudly, never silently tolerated):
  * one xref section `0 n`, generation 0 objects, `/Length` as a direct
  * integer, `/Filter /FlateDecode` or none, no incremental updates, no
  * object streams. Content-stream OPERATORS are not interpreted beyond
  * the one text-showing pattern the synthesis writes (`BT … (text) Tj
  * ET` with the §7.3.4.2 string escapes) — rendering is out of scope;
  * the structural and compression layers are real.
  *
  * Scale shape: per-row container walks riding the scan (map-only, the
  * codec-tier discipline); at 100 TB the synthesis is replaced by
  * `binaryFile` scans of real PDFs and the walk is unchanged.
  */
object Pdf {

  private val Ascii = java.nio.charset.StandardCharsets.US_ASCII

  /** §7.3.4.2 literal-string escapes: backslash before `\ ( )`. */
  private[multimodal] def escapeString(s: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(s.length + 8)
    s.foreach { b =>
      if (b == '\\' || b == '(' || b == ')') out.write('\\')
      out.write(b)
    }
    out.toByteArray
  }

  private[multimodal] def unescapeString(s: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val b = s(i)
      if (b == '\\') {
        require(i + 1 < s.length, "pdf: dangling escape in literal string")
        val n = s(i + 1)
        require(n == '\\' || n == '(' || n == ')',
          s"pdf: unsupported escape '\\${n.toChar}' in literal string")
        out.write(n); i += 2
      } else {
        require(b != '(' && b != ')',
          "pdf: unescaped delimiter inside literal string")
        out.write(b); i += 1
      }
    }
    out.toByteArray
  }

  /** Encode one single-page PDF. `text` becomes the page's content
    * stream (`BT /F1 12 Tf (…) Tj ET`, escaped); `flate` compresses it
    * with the engine's zlib encoder. `lieXref` shifts object 3's xref
    * offset by +1 and `lieLength` under-declares the stream `/Length`
    * by 1 — the mux-writes-lies corruption knobs for the quarantine
    * tier (the encoder writes what it is told; the DECODER owns the
    * checks).
    */
  def encodePdf(text: Array[Byte], pageW: Int, pageH: Int, flate: Boolean,
      lieXref: Boolean = false, lieLength: Boolean = false): Array[Byte] = {
    require(pageW >= 1 && pageH >= 1, s"pdf: page ${pageW}x$pageH")
    val content = ("BT /F1 12 Tf (".getBytes(Ascii) ++ escapeString(text)
      ++ ") Tj ET".getBytes(Ascii))
    val data = if (flate) graft.web.Deflate.zlibWrap(content) else content
    val declaredLen = data.length - (if (lieLength) 1 else 0)
    val o1 = "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
    val o2 = "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
    val o3 = s"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox " +
      s"[0 0 $pageW $pageH] /Contents 4 0 R >> endobj\n"
    val o4head = s"4 0 obj << /Length $declaredLen" +
      (if (flate) " /Filter /FlateDecode" else "") + " >> stream\n"
    val o4tail = "\nendstream endobj\n"
    val header = "%PDF-1.4\n"
    val off1 = header.length
    val off2 = off1 + o1.length
    val off3 = off2 + o2.length
    val off4 = off3 + o3.length
    val xrefOff = off4 + o4head.length + data.length + o4tail.length
    val xref = new StringBuilder("xref\n0 5\n0000000000 65535 f \n")
    Seq(off1, off2, if (lieXref) off3 + 1 else off3, off4).foreach { o =>
      xref.append(f"$o%010d 00000 n \n")
    }
    val trailer = "trailer << /Size 5 /Root 1 0 R >>\n" +
      s"startxref\n$xrefOff\n%%EOF\n"
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = { val b = s.getBytes(Ascii); out.write(b, 0, b.length) }
    w(header); w(o1); w(o2); w(o3); w(o4head)
    out.write(data, 0, data.length)
    w(o4tail); w(xref.toString); w(trailer)
    out.toByteArray
  }

  /** One walked in-use object: number, declared xref offset, the
    * `/Type` name if the dict carries one, and for stream objects the
    * wire + decoded stream sizes and whether `/FlateDecode` applied.
    */
  final case class PdfObject(num: Int, offset: Int, objType: String,
      streamWire: Int = -1, streamDecoded: Int = -1, flate: Boolean = false)

  final case class PdfDoc(objects: Vector[PdfObject], xrefOffset: Int,
      pageW: Int, pageH: Int, content: Array[Byte], totalBytes: Int)

  /** Walk a PDF structurally — the real reading order: `startxref`
    * from the end, the xref table, then every in-use object resolved
    * at its declared offset. Violations are contract errors: a missing
    * header, a dangling `startxref`, a malformed 20-byte xref entry,
    * an offset whose bytes do not open `N 0 obj`, a stream whose
    * declared `/Length` does not land exactly on `endstream`, a bad
    * zlib container, a catalog that does not resolve.
    */
  def decodePdf(bytes: Array[Byte]): PdfDoc = {
    require(bytes.length >= 32, s"pdf: ${bytes.length} bytes is too short")
    val s = new String(bytes, Ascii) // structural tokens are ASCII; the
    // stream payload is sliced from `bytes` by offset, never via `s`
    require(s.startsWith("%PDF-1."), "pdf: missing %PDF header")
    require(s.endsWith("%%EOF\n"), "pdf: missing %%EOF trailer marker")
    val sx = s.lastIndexOf("startxref\n")
    require(sx >= 0, "pdf: no startxref")
    val xrefOff = {
      val rest = s.substring(sx + 10, s.length - 6)
      require(rest.nonEmpty && rest.dropRight(1).forall(_.isDigit) &&
        rest.endsWith("\n"), s"pdf: bad startxref value '$rest'")
      rest.trim.toInt
    }
    require(xrefOff < bytes.length && s.startsWith("xref\n", xrefOff),
      s"pdf: startxref $xrefOff does not point at an xref table")
    var p = xrefOff + 5
    val nl = s.indexOf('\n', p)
    val sub = s.substring(p, nl).split(" ")
    require(sub.length == 2 && sub(0) == "0",
      s"pdf: unsupported xref subsection '${s.substring(p, nl)}'")
    val count = sub(1).toInt
    require(count >= 1, "pdf: empty xref")
    p = nl + 1
    val entries = (0 until count).map { i =>
      val e = s.substring(p, p + 20)
      require(e.length == 20 && e(10) == ' ' && e(16) == ' ' &&
        (e(17) == 'n' || e(17) == 'f') && e.endsWith(" \n"),
        s"pdf: malformed xref entry $i '$e'")
      val off = e.substring(0, 10).toInt
      val gen = e.substring(11, 16).toInt
      p += 20
      (i, off, gen, e(17))
    }
    require(entries.head._4 == 'f', "pdf: entry 0 must be free")
    var pageW = -1; var pageH = -1
    var content: Array[Byte] = null
    val objs = entries.tail.map { case (num, off, gen, kind) =>
      require(kind == 'n' && gen == 0,
        s"pdf: object $num entry ($gen, $kind) outside the subset")
      require(off < bytes.length && s.startsWith(s"$num 0 obj ", off),
        s"pdf: xref offset $off for object $num does not open '$num 0 obj'")
      val dictStart = s.indexOf("<<", off)
      val dictEnd = s.indexOf(">>", dictStart)
      require(dictStart > 0 && dictEnd > dictStart,
        s"pdf: object $num has no dictionary")
      val dict = s.substring(dictStart + 2, dictEnd)
      val objType = "/Type /(\\w+)".r.findFirstMatchIn(dict)
        .map(_.group(1)).getOrElse("")
      if (objType == "Page") {
        val mb = "/MediaBox \\[0 0 (\\d+) (\\d+)\\]".r.findFirstMatchIn(dict)
          .getOrElse(throw new IllegalArgumentException(
            s"pdf: page object $num without a parseable MediaBox"))
        pageW = mb.group(1).toInt; pageH = mb.group(2).toInt
      }
      if (dict.contains("/Length")) {
        val len = "/Length (\\d+)".r.findFirstMatchIn(dict)
          .getOrElse(throw new IllegalArgumentException(
            s"pdf: stream object $num with a non-integer /Length"))
          .group(1).toInt
        val flate = dict.contains("/Filter /FlateDecode")
        val streamTok = s.indexOf("stream\n", dictEnd)
        require(streamTok == dictEnd + 3,
          s"pdf: object $num dict not followed by 'stream'")
        val dataStart = streamTok + 7
        require(dataStart + len <= bytes.length,
          s"pdf: stream of $len bytes over-runs the file")
        require(s.startsWith("\nendstream endobj\n", dataStart + len),
          s"pdf: declared /Length $len does not land on endstream " +
            s"(object $num)")
        val data = java.util.Arrays.copyOfRange(bytes, dataStart,
          dataStart + len)
        val decoded =
          if (flate) graft.web.Deflate.zlibInflate(data) else data
        require(content == null, "pdf: multiple content streams in subset")
        content = decoded
        PdfObject(num, off, objType, len, decoded.length, flate)
      } else PdfObject(num, off, objType)
    }
    require(objs.exists(_.objType == "Catalog"),
      "pdf: no catalog object resolves")
    require(content != null, "pdf: no content stream resolves")
    require(pageW > 0 && pageH > 0, "pdf: no page object resolves")
    PdfDoc(objs.toVector, xrefOff, pageW, pageH, content, bytes.length)
  }

  /** The text back OUT of a walked PDF: the content stream must carry
    * exactly the one text-showing pattern the subset defines, and the
    * literal string unescapes byte-exactly — a slipped offset, a bad
    * inflate, or a mangled escape garbles the recovered text.
    */
  def extractText(doc: PdfDoc): Array[Byte] = {
    val c = new String(doc.content, Ascii)
    require(c.startsWith("BT /F1 12 Tf (") && c.endsWith(") Tj ET"),
      "pdf: content stream is not the subset's text-showing pattern")
    unescapeString(java.util.Arrays.copyOfRange(
      doc.content, 14, doc.content.length - 7))
  }

  // ------------------------------------------------------ Spark tiers

  private[multimodal] def pdfBytesFor(id: Long, t: String,
      breakRefs: Boolean): Array[Byte] = {
    val codes = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .filter(b => (b & 0x80) == 0)
    encodePdf(codes,
      pageW = 400 + (id % 5).toInt * 50,
      pageH = 500 + (id % 4).toInt * 70,
      flate = id % 2 == 0,
      lieXref = breakRefs && id % 13 == 0,
      lieLength = breakRefs && id % 13 != 0 && id % 11 == 0)
  }

  /** Genuine single-page PDFs synthesized from the corpus — even ids
    * FlateDecode (the engine's own zlib), odd ids uncompressed, page
    * size id-derived. `breakRefs` plants the quarantine tier's lies
    * (id % 13: xref entry off by one; else id % 11: /Length short by
    * one) — STRUCTURAL damage a byte-flip cannot express.
    */
  def pdfFromText(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, breakRefs: Boolean = false): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("media_id"),
        coalesce(col(textCol), lit("")).as("t"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        MediaRow(id, "application/pdf", pdfBytesFor(id, t, breakRefs))
      })
  }

  case class PdfCensus(media_id: Long, n_objects: Long, has_flate: Long,
      page_w: Long, page_h: Long, stream_wire_bytes: Long,
      content_bytes: Long, content_sum: Long, xref_offset: Long,
      total_bytes: Long)

  /** Census of really-walked PDFs: object count from the xref, the
    * page's MediaBox, the content stream's wire and DECODED sizes plus
    * its decoded byte-value sum (content identity through the inflate,
    * not just length), the xref table's byte offset (every object and
    * stream length upstream of it must be exact for this single number
    * to match), and the file total. Map-only.
    */
  def pdfCensus(media: Dataset[MediaRow]): Dataset[PdfCensus] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val d = decodePdf(r.content)
      PdfCensus(r.media_id, d.objects.size.toLong,
        if (d.objects.exists(_.flate)) 1L else 0L,
        d.pageW.toLong, d.pageH.toLong,
        d.objects.find(_.streamWire >= 0).map(_.streamWire.toLong)
          .getOrElse(0L),
        d.content.length.toLong,
        d.content.iterator.map(b => (b & 0xFF).toLong).sum,
        d.xrefOffset.toLong, d.totalBytes.toLong)
    })
  }

  case class TriedPdfCensus(media_id: Long, decode_ok: Long,
      n_objects: Long, has_flate: Long, page_w: Long, page_h: Long,
      stream_wire_bytes: Long, content_bytes: Long, content_sum: Long,
      xref_offset: Long, total_bytes: Long)

  /** The census with quarantine semantics: a lying xref entry or a
    * short /Length is caught by the walk's offset/landing contracts
    * and becomes a zeroed `decode_ok = 0` row — never a mis-resolved
    * object, never a mis-sliced stream.
    */
  def tryPdfCensus(media: Dataset[MediaRow]): Dataset[TriedPdfCensus] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      try {
        val d = decodePdf(r.content)
        TriedPdfCensus(r.media_id, 1L, d.objects.size.toLong,
          if (d.objects.exists(_.flate)) 1L else 0L,
          d.pageW.toLong, d.pageH.toLong,
          d.objects.find(_.streamWire >= 0).map(_.streamWire.toLong)
            .getOrElse(0L),
          d.content.length.toLong,
          d.content.iterator.map(b => (b & 0xFF).toLong).sum,
          d.xrefOffset.toLong, d.totalBytes.toLong)
      } catch {
        case scala.util.control.NonFatal(_) =>
          TriedPdfCensus(r.media_id, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
            0L, 0L)
      }
    })
  }

  case class PdfExtract(doc_id: Long, pdf_bytes: Long, n_chars: Long,
      sum_chars: Long)

  /** The full-stack text recovery: xref → object → /Length slice →
    * zlib inflate → literal-string unescape, priced against the SOURCE
    * text by the oracle — byte-exact through all four layers or the
    * sums shift.
    */
  def extractPdfDocs(media: Dataset[MediaRow]): Dataset[PdfExtract] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val t = extractText(decodePdf(r.content))
      PdfExtract(r.media_id, r.content.length.toLong, t.length.toLong,
        t.iterator.map(b => (b & 0xFF).toLong).sum)
    })
  }
}
