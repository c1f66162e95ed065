package graft.web

/** ISO 28500 (WARC/1.0) record framing — the container of every
  * Common-Crawl-shaped web corpus. A record is a CRLF-delimited header
  * block (version line, named fields, `Content-Length`) followed by
  * exactly `Content-Length` payload bytes and a `\r\n\r\n` terminator;
  * an archive is a concatenation of records, and on the wire each
  * record is its own gzip member ([[Gzip]]) so readers can seek to a
  * record by (offset, length) without touching the rest of the file —
  * the CDX index contract this engine's front-door queries materialize.
  *
  * The ENCODER emits a fixed header-field order (version, WARC-Type,
  * WARC-Record-ID, optional WARC-Target-URI, Content-Type,
  * Content-Length) so a second engine can price every header byte from
  * the source columns; the DECODER accepts any field order and
  * case-insensitive field names (the spec's rule), requires the
  * mandatory fields, and fails loudly on a bad version line, a
  * non-numeric or missing Content-Length, a truncated payload, or a
  * missing record terminator — the 100 TB quarantine discipline.
  */
object Warc {

  /** One parsed record: `offset` in the uncompressed stream it was cut
    * from, total header bytes (version line through the blank line),
    * the mandatory fields, and the payload slice.
    */
  final case class Record(offset: Long, headerBytes: Int, warcType: String,
      recordId: String, targetUri: Option[String], contentType: String,
      payload: Array[Byte])

  private val Ascii = java.nio.charset.StandardCharsets.US_ASCII

  private def isAscii(s: String): Boolean = s.forall(c => c >= 0x20 && c < 0x7F)

  /** Encode one record with the deterministic field order above. */
  def encodeRecord(warcType: String, recordId: String,
      targetUri: Option[String], contentType: String,
      payload: Array[Byte]): Array[Byte] = {
    require(isAscii(warcType) && isAscii(recordId) && isAscii(contentType) &&
      targetUri.forall(isAscii),
      "warc: header values must be printable ASCII")
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append("WARC-Type: ").append(warcType).append("\r\n")
    sb.append("WARC-Record-ID: <").append(recordId).append(">\r\n")
    targetUri.foreach(u => sb.append("WARC-Target-URI: ").append(u).append("\r\n"))
    sb.append("Content-Type: ").append(contentType).append("\r\n")
    sb.append("Content-Length: ").append(payload.length).append("\r\n")
    sb.append("\r\n")
    val head = sb.toString.getBytes(Ascii)
    val out = new Array[Byte](head.length + payload.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(payload, 0, out, head.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** Parse a concatenation of records (one or many). */
  def decodeRecords(bytes: Array[Byte]): Vector[Record] = {
    val out = Vector.newBuilder[Record]
    var pos = 0
    require(bytes.length > 0, "warc: empty input")
    while (pos < bytes.length) {
      val start = pos
      // ---- version line
      val eol0 = lineEnd(bytes, pos)
      val version = new String(bytes, pos, eol0 - pos, Ascii)
      require(version == "WARC/1.0" || version == "WARC/1.1",
        s"warc: bad version line '$version'")
      pos = eol0 + 2
      // ---- named fields until the blank line
      var warcType: String = null
      var recordId: String = null
      var targetUri: Option[String] = None
      var contentType: String = null
      var contentLength = -1L
      var blank = false
      while (!blank) {
        val eol = lineEnd(bytes, pos)
        if (eol == pos) { blank = true; pos += 2 }
        else {
          val line = new String(bytes, pos, eol - pos, Ascii)
          val colon = line.indexOf(':')
          require(colon > 0, s"warc: malformed header line '$line'")
          val name = line.substring(0, colon).trim.toLowerCase
          val value = line.substring(colon + 1).trim
          name match {
            case "warc-type" => warcType = value
            case "warc-record-id" =>
              require(value.startsWith("<") && value.endsWith(">"),
                s"warc: record id '$value' not angle-bracketed")
              recordId = value.substring(1, value.length - 1)
            case "warc-target-uri" => targetUri = Some(value)
            case "content-type" => contentType = value
            case "content-length" =>
              require(value.nonEmpty && value.forall(_.isDigit),
                s"warc: non-numeric Content-Length '$value'")
              contentLength = value.toLong
            case _ => () // unknown fields are legal; skip
          }
          pos = eol + 2
        }
      }
      require(warcType != null, "warc: missing WARC-Type")
      require(recordId != null, "warc: missing WARC-Record-ID")
      require(contentLength >= 0, "warc: missing Content-Length")
      require(contentType != null, "warc: missing Content-Type")
      val headerBytes = pos - start
      require(pos + contentLength + 4 <= bytes.length,
        s"warc: payload of $contentLength bytes overruns stream at $pos")
      val payload = java.util.Arrays.copyOfRange(bytes, pos,
        pos + contentLength.toInt)
      pos += contentLength.toInt
      require(bytes(pos) == '\r' && bytes(pos + 1) == '\n' &&
        bytes(pos + 2) == '\r' && bytes(pos + 3) == '\n',
        s"warc: missing record terminator CRLF CRLF at $pos")
      pos += 4
      out += Record(start.toLong, headerBytes, warcType, recordId, targetUri,
        contentType, payload)
    }
    out.result()
  }

  /** Index of the `\r` of the next CRLF at/after `pos` (header lines
    * are CRLF-terminated; a bare LF or an unterminated line is a
    * contract error).
    */
  private def lineEnd(bytes: Array[Byte], pos: Int): Int = {
    var i = pos
    while (i + 1 < bytes.length && bytes(i) != '\r') {
      require(bytes(i) != '\n', s"warc: bare LF in header at $i")
      i += 1
    }
    require(i + 1 < bytes.length && bytes(i) == '\r' && bytes(i + 1) == '\n',
      s"warc: unterminated header line at $pos")
    i
  }
}
