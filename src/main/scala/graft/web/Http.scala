package graft.web

/** HTTP/1.1 message framing (RFC 9112) — the payload layer inside a
  * real crawl's WARC response records (Common Crawl stores the full
  * HTTP message, `Content-Type: application/http;msgtype=response`,
  * not the bare body). A 100 TB ingest must re-frame the body out of
  * the message before any text processing: status line, header block,
  * then EITHER a `Content-Length` body or `Transfer-Encoding: chunked`
  * — hex-sized chunks each CRLF-delimited, closed by a zero chunk.
  * On top of the transfer coding sits the CONTENT coding (RFC 9110
  * §8.4): real crawls are mostly `Content-Encoding: gzip` on the
  * wire, so [[decodedBody]] composes the message framing with the
  * engine's own RFC 1952 inflate — applied in the spec's order
  * (transfer de-framing first, then content decoding).
  *
  * The decoder enforces the wire grammar loudly (malformed status
  * line, non-numeric length, hex chunk-size garbage, a chunk
  * over-running the message, a missing terminator), because chunked
  * framing is exactly where truncated-in-flight captures corrupt: the
  * quarantine tier plants an over-declared chunk size and the walk
  * must refuse, never mis-slice.
  */
object Http {

  private val Ascii = java.nio.charset.StandardCharsets.US_ASCII

  /** A parsed response: status code + reason, the header list in wire
    * order, whether the body was chunked, the declared content coding
    * (empty = identity), the header block's byte count (status line
    * through the blank line), and the TRANSFER-decoded body (chunk
    * de-framing applied; content coding NOT yet applied — that is
    * [[decodedBody]]'s job, mirroring the spec's layering).
    */
  final case class Response(status: Int, reason: String,
      headers: Vector[(String, String)], chunked: Boolean,
      contentEncoding: String, headerBytes: Int, body: Array[Byte])

  /** The representation bytes: apply the declared Content-Encoding to
    * the transfer-decoded body. `gzip` runs the engine's own RFC 1952
    * walk (CRC32 + ISIZE verified; the body must be exactly one
    * member); `deflate` inflates through the engine's own RFC 1950
    * zlib walk (header + Adler-32 verified); `br` decodes through the
    * engine's own RFC 7932 walk ([[Brotli]] — full grammar, static
    * dictionary, transforms); identity passes through; anything else
    * is a loud contract error, not a silent pass-through.
    */
  def decodedBody(r: Response): Array[Byte] = r.contentEncoding match {
    case "" | "identity" => r.body
    case "gzip" =>
      val ms = Gzip.members(r.body)
      require(ms.size == 1,
        s"http: gzip body with ${ms.size} members (expected 1)")
      ms.head.data
    case "deflate" =>
      // RFC 9110 §8.4.1.2: the zlib container (header + Adler-32), not
      // a bare DEFLATE stream — Deflate.zlibInflate verifies both
      Deflate.zlibInflate(r.body)
    case "br" =>
      // RFC 7932 via the engine's own walk: the body is exactly one
      // brotli stream (Brotli.decode rejects trailing bytes itself)
      Brotli.decode(r.body)
    case other =>
      throw new IllegalArgumentException(
        s"http: unsupported Content-Encoding '$other'")
  }

  /** Encode a response. `chunkSize` > 0 with `chunked = true` frames
    * the body as fixed-size chunks (last one short); otherwise a
    * `Content-Length` header is emitted. Header order is fixed so a
    * second engine can price every byte.
    */
  def encodeResponse(status: Int, reason: String,
      headers: Seq[(String, String)], body: Array[Byte],
      chunked: Boolean, chunkSize: Int = 256): Array[Byte] = {
    require(status >= 100 && status <= 999, s"http: bad status $status")
    require(chunkSize > 0, s"http: bad chunk size $chunkSize")
    val sb = new StringBuilder
    sb.append("HTTP/1.1 ").append(status).append(' ').append(reason)
      .append("\r\n")
    headers.foreach { case (k, v) =>
      sb.append(k).append(": ").append(v).append("\r\n")
    }
    if (chunked) sb.append("Transfer-Encoding: chunked\r\n")
    else sb.append("Content-Length: ").append(body.length).append("\r\n")
    sb.append("\r\n")
    val head = sb.toString.getBytes(Ascii)
    val out = new java.io.ByteArrayOutputStream()
    out.write(head, 0, head.length)
    if (!chunked) out.write(body, 0, body.length)
    else {
      var off = 0
      while (off < body.length) {
        val n = math.min(chunkSize, body.length - off)
        val sz = (Integer.toHexString(n) + "\r\n").getBytes(Ascii)
        out.write(sz, 0, sz.length)
        out.write(body, off, n)
        out.write('\r'); out.write('\n')
        off += n
      }
      val fin = "0\r\n\r\n".getBytes(Ascii)
      out.write(fin, 0, fin.length)
    }
    out.toByteArray
  }

  /** Parse one complete response message occupying the whole input
    * (a WARC record payload). Trailing bytes past the framed body are
    * a contract error — a record that over-declares its content is
    * corrupt, not ignorable.
    */
  def parseResponse(bytes: Array[Byte]): Response = {
    var pos = 0
    def line(): String = {
      val start = pos
      while (pos + 1 < bytes.length &&
        !(bytes(pos) == '\r' && bytes(pos + 1) == '\n')) {
        require(bytes(pos) != '\n', s"http: bare LF at $pos")
        pos += 1
      }
      require(pos + 1 < bytes.length, s"http: unterminated line at $start")
      val s = new String(bytes, start, pos - start, Ascii)
      pos += 2
      s
    }
    val status = line()
    require(status.startsWith("HTTP/1.1 ") || status.startsWith("HTTP/1.0 "),
      s"http: bad status line '$status'")
    val codeStr = status.substring(9).takeWhile(_ != ' ')
    require(codeStr.length == 3 && codeStr.forall(_.isDigit),
      s"http: bad status code in '$status'")
    val code = codeStr.toInt
    val reason = status.substring(math.min(status.length, 9 + codeStr.length))
      .stripPrefix(" ")
    val headers = Vector.newBuilder[(String, String)]
    var contentLength = -1L
    var chunked = false
    var contentEncoding = ""
    var blank = false
    while (!blank) {
      val l = line()
      if (l.isEmpty) blank = true
      else {
        val colon = l.indexOf(':')
        require(colon > 0, s"http: malformed header '$l'")
        val name = l.substring(0, colon).trim
        val value = l.substring(colon + 1).trim
        headers += (name -> value)
        name.toLowerCase match {
          case "content-length" =>
            require(value.nonEmpty && value.forall(_.isDigit),
              s"http: non-numeric Content-Length '$value'")
            contentLength = value.toLong
          case "transfer-encoding" =>
            require(value.equalsIgnoreCase("chunked"),
              s"http: unsupported Transfer-Encoding '$value'")
            chunked = true
          case "content-encoding" =>
            contentEncoding = value.toLowerCase
          case _ => ()
        }
      }
    }
    val headerBytes = pos
    val body: Array[Byte] =
      if (chunked) {
        val out = new java.io.ByteArrayOutputStream()
        var done = false
        while (!done) {
          val szLine = line()
          require(szLine.nonEmpty && szLine.forall(c =>
            Character.digit(c, 16) >= 0), s"http: bad chunk size '$szLine'")
          require(szLine.length <= 7, s"http: oversized chunk size '$szLine'")
          val n = java.lang.Integer.parseInt(szLine, 16)
          if (n == 0) {
            // zero chunk, then the final empty line (no trailers shipped)
            require(line().isEmpty, "http: unexpected chunk trailers")
            done = true
          } else {
            require(pos + n + 2 <= bytes.length,
              s"http: chunk of $n bytes over-runs message at $pos")
            out.write(bytes, pos, n)
            pos += n
            require(bytes(pos) == '\r' && bytes(pos + 1) == '\n',
              s"http: missing CRLF after chunk at $pos")
            pos += 2
          }
        }
        out.toByteArray
      } else {
        require(contentLength >= 0,
          "http: neither Content-Length nor chunked framing")
        require(pos + contentLength <= bytes.length,
          s"http: body of $contentLength over-runs message at $pos")
        val b = java.util.Arrays.copyOfRange(bytes, pos,
          pos + contentLength.toInt)
        pos += contentLength.toInt
        b
      }
    require(pos == bytes.length,
      s"http: ${bytes.length - pos} trailing bytes after the framed body")
    Response(code, reason, headers.result(), chunked, contentEncoding,
      headerBytes, body)
  }
}
