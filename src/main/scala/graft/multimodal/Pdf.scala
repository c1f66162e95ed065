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
  * generation 0 objects, `/Length` as a direct integer, `/Filter
  * /FlateDecode` or none. Round 16 removed the two §7.5 exclusions
  * real PDFs hit most: INCREMENTAL UPDATES (§7.5.6 — classic xref
  * sections with arbitrary subsections, chained through the trailer's
  * `/Prev`, newest entry wins) and OBJECT STREAMS (§7.5.7 — `/Type
  * /ObjStm` carriers holding compressed non-stream objects) reached
  * through CROSS-REFERENCE STREAMS (§7.5.8 — binary `/W`-packed
  * type-0/1/2 rows, themselves FlateDecoded by the engine's own RFC
  * 1950 walk). Content-stream OPERATORS are not interpreted beyond
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

  /** §7.5.6 incremental update: a classic base document whose content
    * stream shows the fixed marker `stale`, plus an APPENDED update
    * section — a replacement object 4 carrying the real `text`, a
    * classic xref section with the subsection `4 1`, and a trailer
    * whose `/Prev` chains back to the base xref table. A correct walk
    * must resolve the UPDATE's object 4 (newest section wins) or the
    * recovered text reads `stale` and every sum shifts. The lie knobs
    * target the update section (its xref entry / its stream length) —
    * the base stays pristine, so only the §7.5.6 chain walk can catch
    * them.
    */
  def encodePdfIncremental(text: Array[Byte], pageW: Int, pageH: Int,
      flate: Boolean, lieXref: Boolean = false,
      lieLength: Boolean = false): Array[Byte] = {
    val base = encodePdf("stale".getBytes(Ascii), pageW, pageH,
      flate = false)
    val baseStr = new String(base, Ascii)
    val baseXref = {
      val sx = baseStr.lastIndexOf("startxref\n")
      baseStr.substring(sx + 10, baseStr.length - 6).trim.toInt
    }
    val content = ("BT /F1 12 Tf (".getBytes(Ascii) ++ escapeString(text)
      ++ ") Tj ET".getBytes(Ascii))
    val data = if (flate) graft.web.Deflate.zlibWrap(content) else content
    val declaredLen = data.length - (if (lieLength) 1 else 0)
    val o4off = base.length
    val o4head = s"4 0 obj << /Length $declaredLen" +
      (if (flate) " /Filter /FlateDecode" else "") + " >> stream\n"
    val o4tail = "\nendstream endobj\n"
    val xref2off = o4off + o4head.length + data.length + o4tail.length
    val entryOff = if (lieXref) o4off + 1 else o4off
    val xref2 = "xref\n4 1\n" + f"$entryOff%010d 00000 n \n" +
      s"trailer << /Size 5 /Root 1 0 R /Prev $baseXref >>\n" +
      s"startxref\n$xref2off\n%%EOF\n"
    val out = new java.io.ByteArrayOutputStream(base.length + 256)
    out.write(base, 0, base.length)
    val h = o4head.getBytes(Ascii); out.write(h, 0, h.length)
    out.write(data, 0, data.length)
    val t = (o4tail + xref2).getBytes(Ascii); out.write(t, 0, t.length)
    out.toByteArray
  }

  /** §7.5.7 + §7.5.8: a PDF-1.5 document whose catalog/pages/page
    * dictionaries live COMPRESSED inside a `/Type /ObjStm` carrier
    * (object 5, FlateDecoded by the engine's own zlib walk; pair table
    * + `/First` slicing), referenced from a binary CROSS-REFERENCE
    * STREAM (object 6, `/W [1 4 1]` type-0/1/2 rows, itself
    * FlateDecoded). Object 4 is the regular content stream. The lie
    * knobs keep the classic tier's two classes (xref offset off by
    * one, `/Length` short by one), now expressed through the binary
    * xref rows — plus `lieObjStm`, which over-declares `/First` by
    * one, structural damage only the §7.5.7 pair-table grammar can
    * catch (the slice boundary swallows a body byte into the header).
    */
  def encodePdfObjStm(text: Array[Byte], pageW: Int, pageH: Int,
      flate: Boolean, lieXref: Boolean = false, lieLength: Boolean = false,
      lieObjStm: Boolean = false): Array[Byte] = {
    val content = ("BT /F1 12 Tf (".getBytes(Ascii) ++ escapeString(text)
      ++ ") Tj ET".getBytes(Ascii))
    val data = if (flate) graft.web.Deflate.zlibWrap(content) else content
    val declaredLen = data.length - (if (lieLength) 1 else 0)
    // the three dictionary-only objects, packed into the object stream
    val b1 = "<< /Type /Catalog /Pages 2 0 R >>\n"
    val b2 = "<< /Type /Pages /Kids [3 0 R] /Count 1 >>\n"
    val b3 = s"<< /Type /Page /Parent 2 0 R /MediaBox " +
      s"[0 0 $pageW $pageH] /Contents 4 0 R >>\n"
    val off2 = b1.length
    val off3 = b1.length + b2.length
    val header = s"1 0 2 $off2 3 $off3\n"
    val objStmPlain = (header + b1 + b2 + b3).getBytes(Ascii)
    val objStmData = graft.web.Deflate.zlibWrap(objStmPlain)
    val declaredFirst = header.length + (if (lieObjStm) 1 else 0)
    val header5 = s"5 0 obj << /Type /ObjStm /N 3 /First $declaredFirst" +
      s" /Filter /FlateDecode /Length ${objStmData.length} >> stream\n"
    val hdr = "%PDF-1.5\n"
    val o4off = hdr.length
    val o4head = s"4 0 obj << /Length $declaredLen" +
      (if (flate) " /Filter /FlateDecode" else "") + " >> stream\n"
    val tail = "\nendstream endobj\n"
    val o5off = o4off + o4head.length + data.length + tail.length
    val o6off = o5off + header5.length + objStmData.length + tail.length
    // binary xref rows, W = [1 4 1]: 7 objects (0 free; 1-3 in the
    // object stream; 4-6 direct)
    val rows = new java.io.ByteArrayOutputStream(42)
    def row(t: Int, f2: Int, f3: Int): Unit = {
      rows.write(t)
      rows.write((f2 >>> 24) & 0xFF); rows.write((f2 >>> 16) & 0xFF)
      rows.write((f2 >>> 8) & 0xFF); rows.write(f2 & 0xFF)
      rows.write(f3)
    }
    row(0, 0, 0)
    row(2, 5, 0); row(2, 5, 1); row(2, 5, 2)
    row(1, if (lieXref) o4off + 1 else o4off, 0)
    row(1, o5off, 0)
    row(1, o6off, 0)
    val xrefData = graft.web.Deflate.zlibWrap(rows.toByteArray)
    val header6 = s"6 0 obj << /Type /XRef /Size 7 /W [1 4 1] " +
      s"/Root 1 0 R /Filter /FlateDecode /Length ${xrefData.length}" +
      s" >> stream\n"
    val out = new java.io.ByteArrayOutputStream(512 + data.length)
    def w(str: String): Unit = {
      val b = str.getBytes(Ascii); out.write(b, 0, b.length)
    }
    w(hdr)
    w(o4head); out.write(data, 0, data.length); w(tail)
    w(header5); out.write(objStmData, 0, objStmData.length); w(tail)
    w(header6); out.write(xrefData, 0, xrefData.length); w(tail)
    w(s"startxref\n$o6off\n%%EOF\n")
    out.toByteArray
  }

  /** One walked in-use object: number, declared xref offset, the
    * `/Type` name if the dict carries one, and for stream objects the
    * wire + decoded stream sizes and whether `/FlateDecode` applied.
    */
  final case class PdfObject(num: Int, offset: Int, objType: String,
      streamWire: Int = -1, streamDecoded: Int = -1, flate: Boolean = false)

  final case class PdfDoc(objects: Vector[PdfObject], xrefOffset: Int,
      pageW: Int, pageH: Int, content: Array[Byte], totalBytes: Int,
      nSections: Int = 1, xrefStream: Boolean = false, nInObjStm: Int = 0)

  /** An xref entry after section merging: type 1 = at byte offset,
    * type 2 = object `idx` inside object stream `objstm`.
    */
  private final case class XEntry(kind: Int, a: Int, b: Int)

  /** Walk a PDF structurally — the real reading order: `startxref`
    * from the end, then the cross-reference SECTION CHAIN (classic
    * tables with arbitrary subsections OR §7.5.8 xref streams, linked
    * newest-to-oldest by `/Prev`; the newest entry for an object
    * wins — §7.5.6 incremental updates), then every in-use object
    * resolved at its declared offset — including §7.5.7 object-stream
    * members sliced out of their FlateDecoded carrier by the `/First`
    * + pair-table arithmetic. Violations are contract errors: a
    * missing header, a dangling `startxref`, a malformed 20-byte xref
    * entry or binary xref row, an offset whose bytes do not open
    * `N 0 obj`, a stream whose declared `/Length` does not land
    * exactly on `endstream`, an object-stream pair table that does
    * not cover a referenced index, a bad zlib container, a catalog
    * that does not resolve.
    */
  def decodePdf(bytes: Array[Byte]): PdfDoc = {
    require(bytes.length >= 32, s"pdf: ${bytes.length} bytes is too short")
    val s = new String(bytes, Ascii) // structural tokens are ASCII; the
    // stream payload is sliced from `bytes` by offset, never via `s`
    require(s.startsWith("%PDF-1."), "pdf: missing %PDF header")
    require(s.endsWith("%%EOF\n"), "pdf: missing %%EOF trailer marker")
    val sx = s.lastIndexOf("startxref\n")
    require(sx >= 0, "pdf: no startxref")
    val startXref = {
      val rest = s.substring(sx + 10, s.length - 6)
      require(rest.nonEmpty && rest.dropRight(1).forall(_.isDigit) &&
        rest.endsWith("\n"), s"pdf: bad startxref value '$rest'")
      rest.trim.toInt
    }

    def dictOf(off: Int, num: Int): (String, Int) = {
      val dictStart = s.indexOf("<<", off)
      val dictEnd = s.indexOf(">>", dictStart)
      require(dictStart > 0 && dictEnd > dictStart,
        s"pdf: object $num has no dictionary")
      (s.substring(dictStart + 2, dictEnd), dictEnd)
    }

    def streamBytes(num: Int, dict: String, dictEnd: Int): Array[Byte] = {
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
      if (flate) graft.web.Deflate.zlibInflate(data) else data
    }

    // ---- cross-reference section chain (newest first; /Prev links)
    val entries = scala.collection.mutable.LinkedHashMap.empty[Int, XEntry]
    def record(num: Int, e: XEntry): Unit =
      if (!entries.contains(num)) entries(num) = e // newest section wins
    var sectionPos = startXref
    var nSections = 0
    var sawXrefStream = false
    val visited = scala.collection.mutable.Set.empty[Int]
    while (sectionPos >= 0) {
      require(visited.add(sectionPos), "pdf: /Prev chain loops")
      require(sectionPos < bytes.length,
        s"pdf: xref section offset $sectionPos past end of file")
      nSections += 1
      var prev = -1
      if (s.startsWith("xref\n", sectionPos)) {
        // classic table: subsections until the trailer keyword
        var p = sectionPos + 5
        while (!s.startsWith("trailer", p)) {
          val nl = s.indexOf('\n', p)
          require(nl > p, "pdf: unterminated xref subsection header")
          val sub = s.substring(p, nl).split(" ")
          require(sub.length == 2 && sub.forall(_.forall(_.isDigit)),
            s"pdf: malformed xref subsection '${s.substring(p, nl)}'")
          val start = sub(0).toInt
          val count = sub(1).toInt
          p = nl + 1
          var i = 0
          while (i < count) {
            val e = s.substring(p, p + 20)
            require(e.length == 20 && e(10) == ' ' && e(16) == ' ' &&
              (e(17) == 'n' || e(17) == 'f') && e.endsWith(" \n"),
              s"pdf: malformed xref entry ${start + i} '$e'")
            val off = e.substring(0, 10).toInt
            val gen = e.substring(11, 16).toInt
            if (e(17) == 'n') {
              require(gen == 0,
                s"pdf: object ${start + i} generation $gen outside subset")
              record(start + i, XEntry(1, off, 0))
            } else record(start + i, XEntry(0, 0, 0))
            p += 20
            i += 1
          }
        }
        val (tdict, _) = dictOf(p, -1)
        prev = "/Prev (\\d+)".r.findFirstMatchIn(tdict)
          .map(_.group(1).toInt).getOrElse(-1)
      } else {
        // §7.5.8 xref STREAM: `N 0 obj` with /Type /XRef
        sawXrefStream = true
        val m = "^(\\d+) 0 obj ".r.findFirstMatchIn(s.substring(sectionPos,
          math.min(s.length, sectionPos + 24)))
          .getOrElse(throw new IllegalArgumentException(
            s"pdf: startxref/Prev $sectionPos opens neither a table " +
              "nor an object"))
        val num = m.group(1).toInt
        val (dict, dictEnd) = dictOf(sectionPos, num)
        require(dict.contains("/Type /XRef"),
          s"pdf: object $num at xref position is not /Type /XRef")
        val size = "/Size (\\d+)".r.findFirstMatchIn(dict)
          .getOrElse(throw new IllegalArgumentException(
            s"pdf: xref stream $num without /Size")).group(1).toInt
        val wm = "/W \\[(\\d+) (\\d+) (\\d+)\\]".r.findFirstMatchIn(dict)
          .getOrElse(throw new IllegalArgumentException(
            s"pdf: xref stream $num without a parseable /W"))
        val (w1, w2, w3) = (wm.group(1).toInt, wm.group(2).toInt,
          wm.group(3).toInt)
        require(w1 <= 4 && w2 <= 4 && w3 <= 4,
          s"pdf: xref stream field widths [$w1 $w2 $w3] outside subset")
        val index: Seq[(Int, Int)] =
          "/Index \\[([0-9 ]+)\\]".r.findFirstMatchIn(dict) match {
            case Some(im) =>
              val ns = im.group(1).trim.split(" ").map(_.toInt)
              require(ns.length % 2 == 0,
                s"pdf: odd /Index list in xref stream $num")
              ns.grouped(2).map(a => (a(0), a(1))).toSeq
            case None => Seq((0, size))
          }
        val rows = streamBytes(num, dict, dictEnd)
        val rw = w1 + w2 + w3
        require(rows.length == rw * index.map(_._2).sum,
          s"pdf: xref stream $num carries ${rows.length} bytes, " +
            s"expected ${rw * index.map(_._2).sum}")
        def field(base: Int, w: Int): Int = {
          var v = 0
          var k = 0
          while (k < w) { v = (v << 8) | (rows(base + k) & 0xFF); k += 1 }
          v
        }
        var r = 0
        index.foreach { case (start, count) =>
          var i = 0
          while (i < count) {
            val base = r * rw
            val t = if (w1 == 0) 1 else field(base, w1)
            val f2 = field(base + w1, w2)
            val f3 = field(base + w1 + w2, w3)
            t match {
              case 0 => record(start + i, XEntry(0, 0, 0))
              case 1 =>
                require(f3 == 0,
                  s"pdf: object ${start + i} generation $f3 outside subset")
                record(start + i, XEntry(1, f2, 0))
              case 2 => record(start + i, XEntry(2, f2, f3))
              case other => throw new IllegalArgumentException(
                s"pdf: xref row type $other for object ${start + i}")
            }
            r += 1
            i += 1
          }
        }
        prev = "/Prev (\\d+)".r.findFirstMatchIn(dict)
          .map(_.group(1).toInt).getOrElse(-1)
      }
      sectionPos = prev
    }
    entries.get(0).foreach(e =>
      require(e.kind == 0, "pdf: entry 0 must be free"))

    // ---- resolve type-1 objects (and collect object-stream carriers)
    var pageW = -1; var pageH = -1
    var content: Array[Byte] = null
    val objStms = scala.collection.mutable.Map.empty[Int, (String, Int,
      Array[Byte], Vector[(Int, Int)])] // num -> (dict, First, data, pairs)
    val direct = entries.toSeq.filter(_._2.kind == 1).sortBy(_._1)
      .map { case (num, e) =>
        val off = e.a
        require(off < bytes.length && s.startsWith(s"$num 0 obj ", off),
          s"pdf: xref offset $off for object $num does not open " +
            s"'$num 0 obj'")
        val (dict, dictEnd) = dictOf(off, num)
        val objType = "/Type /(\\w+)".r.findFirstMatchIn(dict)
          .map(_.group(1)).getOrElse("")
        if (objType == "Page") {
          val mb = "/MediaBox \\[0 0 (\\d+) (\\d+)\\]".r
            .findFirstMatchIn(dict)
            .getOrElse(throw new IllegalArgumentException(
              s"pdf: page object $num without a parseable MediaBox"))
          pageW = mb.group(1).toInt; pageH = mb.group(2).toInt
        }
        if (objType == "ObjStm") {
          val n = "/N (\\d+)".r.findFirstMatchIn(dict)
            .getOrElse(throw new IllegalArgumentException(
              s"pdf: object stream $num without /N")).group(1).toInt
          val first = "/First (\\d+)".r.findFirstMatchIn(dict)
            .getOrElse(throw new IllegalArgumentException(
              s"pdf: object stream $num without /First")).group(1).toInt
          val data = streamBytes(num, dict, dictEnd)
          require(first <= data.length,
            s"pdf: /First $first past object stream $num payload")
          val header = new String(data, 0, first, Ascii).trim
          val toks = header.split("\\s+")
          require(toks.length == 2 * n,
            s"pdf: object stream $num pair table has ${toks.length} " +
              s"integers, expected ${2 * n}")
          require(toks.forall(t => t.nonEmpty && t.forall(_.isDigit)),
            s"pdf: non-numeric object-stream pair table in $num")
          val pairs = toks.grouped(2).map(a => (a(0).toInt, a(1).toInt))
            .toVector
          objStms(num) = (dict, first, data, pairs)
          PdfObject(num, off, objType, data.length, data.length,
            dict.contains("/Filter /FlateDecode"))
        } else if (objType != "XRef" && dict.contains("/Length")) {
          val data = streamBytes(num, dict, dictEnd)
          require(content == null, "pdf: multiple content streams in subset")
          content = data
          val wireLen = "/Length (\\d+)".r.findFirstMatchIn(dict)
            .get.group(1).toInt
          PdfObject(num, off, objType, wireLen, data.length,
            dict.contains("/Filter /FlateDecode"))
        } else PdfObject(num, off, objType)
      }

    // ---- resolve type-2 (object-stream members, §7.5.7)
    val members = entries.toSeq.filter(_._2.kind == 2).sortBy(_._1)
      .map { case (num, e) =>
        val (_, first, data, pairs) = objStms.getOrElse(e.a,
          throw new IllegalArgumentException(
            s"pdf: object $num references object stream ${e.a}, which " +
              "does not resolve"))
        require(e.b < pairs.length,
          s"pdf: object $num index ${e.b} past object stream ${e.a}'s " +
            s"${pairs.length} members")
        val (declaredNum, relOff) = pairs(e.b)
        require(declaredNum == num,
          s"pdf: object stream ${e.a} slot ${e.b} declares object " +
            s"$declaredNum, xref claims $num")
        val bodyStart = first + relOff
        val bodyEnd =
          if (e.b + 1 < pairs.length) first + pairs(e.b + 1)._2
          else data.length
        require(bodyStart <= bodyEnd && bodyEnd <= data.length,
          s"pdf: object $num slice [$bodyStart, $bodyEnd) outside " +
            s"object stream ${e.a}")
        val body = new String(data, bodyStart, bodyEnd - bodyStart, Ascii)
        val objType = "/Type /(\\w+)".r.findFirstMatchIn(body)
          .map(_.group(1)).getOrElse("")
        if (objType == "Page") {
          val mb = "/MediaBox \\[0 0 (\\d+) (\\d+)\\]".r
            .findFirstMatchIn(body)
            .getOrElse(throw new IllegalArgumentException(
              s"pdf: page object $num without a parseable MediaBox"))
          pageW = mb.group(1).toInt; pageH = mb.group(2).toInt
        }
        PdfObject(num, -1, objType)
      }

    val objs = (direct ++ members).sortBy(_.num)
    require(objs.exists(_.objType == "Catalog"),
      "pdf: no catalog object resolves")
    require(content != null, "pdf: no content stream resolves")
    require(pageW > 0 && pageH > 0, "pdf: no page object resolves")
    PdfDoc(objs.toVector, startXref, pageW, pageH, content, bytes.length,
      nSections, sawXrefStream, members.size)
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

  // ------------------------------------------- PDF 1.5 mixed corpus

  private[multimodal] def pdf15BytesFor(id: Long, t: String,
      breakRefs: Boolean): Array[Byte] = {
    val codes = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .filter(b => (b & 0x80) == 0)
    val w = 400 + (id % 5).toInt * 50
    val h = 500 + (id % 4).toInt * 70
    val fl = id % 2 == 0
    val lie13 = breakRefs && id % 13 == 0
    val lie11 = breakRefs && id % 13 != 0 && id % 11 == 0
    (id % 3) match {
      case 0 => encodePdf(codes, w, h, fl, lieXref = lie13,
        lieLength = lie11)
      case 1 => encodePdfIncremental(codes, w, h, fl, lieXref = lie13,
        lieLength = lie11)
      case _ => encodePdfObjStm(codes, w, h, fl, lieLength = lie11,
        lieObjStm = lie13)
    }
  }

  /** The MIXED corpus real crawls hold: classic single-section PDFs
    * (id ≡ 0 mod 3), §7.5.6 incrementally-updated PDFs (≡ 1), and
    * PDF-1.5 object-stream/xref-stream PDFs (≡ 2), one per doc.
    * `breakRefs` plants the per-variant structural lies (id % 13: xref
    * entry off by one — expressed through the 20-byte table, the
    * update section, or the `/First` pair-table boundary per variant;
    * else id % 11: `/Length` short by one).
    */
  def pdf15FromText(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, breakRefs: Boolean = false): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("media_id"),
        coalesce(col(textCol), lit("")).as("t"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        MediaRow(id, "application/pdf", pdf15BytesFor(id, t, breakRefs))
      })
  }

  case class Pdf15Census(media_id: Long, variant: String,
      xref_stream: Long, n_sections: Long, n_objects: Long,
      n_in_objstm: Long, has_flate: Long, page_w: Long, page_h: Long,
      content_bytes: Long, content_sum: Long, total_bytes: Long)

  /** Census of the mixed corpus: which cross-reference machinery the
    * walk actually used (table vs stream, section count, object-stream
    * member count) next to the content identity — every field priced
    * by the oracle from the per-variant layout arithmetic.
    */
  def pdf15Census(media: Dataset[MediaRow]): Dataset[Pdf15Census] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val d = decodePdf(r.content)
      Pdf15Census(r.media_id,
        (r.media_id % 3) match {
          case 0 => "classic"
          case 1 => "incremental"
          case _ => "objstm"
        },
        if (d.xrefStream) 1L else 0L, d.nSections.toLong,
        d.objects.size.toLong, d.nInObjStm.toLong,
        if (d.objects.exists(_.flate)) 1L else 0L,
        d.pageW.toLong, d.pageH.toLong,
        d.content.length.toLong,
        d.content.iterator.map(b => (b & 0xFF).toLong).sum,
        d.totalBytes.toLong)
    })
  }

  case class TriedPdf15Census(media_id: Long, decode_ok: Long,
      n_sections: Long, n_objects: Long, n_in_objstm: Long,
      content_bytes: Long, content_sum: Long, total_bytes: Long)

  /** Quarantine semantics over the mixed corpus: a lying update-section
    * entry, a short `/Length`, or an over-declared `/First` is caught
    * by the walk's offset/landing/pair-table contracts and becomes a
    * zeroed `decode_ok = 0` row — never a stale object 4, never a
    * mis-sliced object-stream member.
    */
  def tryPdf15Census(
      media: Dataset[MediaRow]): Dataset[TriedPdf15Census] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      try {
        val d = decodePdf(r.content)
        TriedPdf15Census(r.media_id, 1L, d.nSections.toLong,
          d.objects.size.toLong, d.nInObjStm.toLong,
          d.content.length.toLong,
          d.content.iterator.map(b => (b & 0xFF).toLong).sum,
          d.totalBytes.toLong)
      } catch {
        case scala.util.control.NonFatal(_) =>
          TriedPdf15Census(r.media_id, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
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
