package graft.multimodal

/** From-scratch, zero-dependency codecs for the two classic uncompressed
  * media containers — real parsers, not stubs:
  *
  *  - Netpbm P6 (binary PPM) images: the public Netpbm format — ASCII
  *    header `P6 <width> <height> <maxval>` with `#` comments and
  *    arbitrary whitespace, then a raw RGB plane, one byte per channel
  *    for maxval < 256.
  *  - RIFF/WAVE PCM audio: the public Microsoft RIFF container — the
  *    `fmt ` chunk (format tag, channels, sample rate, bits/sample) and
  *    the `data` chunk located by WALKING the chunk list (unknown
  *    chunks are skipped by their declared size, as the spec requires),
  *    16-bit little-endian signed samples.
  *
  * Both decoders validate what they parse and fail loudly on malformed
  * input — a corrupt payload in a 100 TB media lake should surface as a
  * quarantined error row, never a silently wrong statistic. Everything
  * here is pure JVM arithmetic (no image/audio libraries exist in this
  * environment, and none are needed for these formats), so the decode
  * kernels run inside the same per-partition iterators the rest of
  * [[Multimodal]] uses.
  *
  * Reference behavior being replaced: the reference pipeline stores and
  * ships opaque payloads only (scraping_jobsdb holds HTML text); these
  * codecs are the "beyond the reference" multimodal tier — the decode /
  * feature-extract step a training-data pipeline runs between the
  * binary column and the feature table.
  */
object Codecs {

  /** A decoded P6 image: dimensions + the raw interleaved RGB plane
    * (3 bytes per pixel, row-major).
    */
  final case class PpmImage(width: Int, height: Int, maxVal: Int,
      pixels: Array[Byte])

  /** A decoded PCM WAV: format fields as READ FROM THE FILE plus the
    * signed 16-bit samples (channel-interleaved when channels > 1).
    */
  final case class WavAudio(channels: Int, sampleRate: Int,
      bitsPerSample: Int, samples: Array[Short])

  // ---------------------------------------------------------------- PPM

  /** Encode a P6 binary PPM. `pixels` must be exactly width*height*3
    * bytes of interleaved RGB.
    */
  def encodePpm(width: Int, height: Int, maxVal: Int,
      pixels: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(maxVal > 0 && maxVal < 256, s"maxval $maxVal not in [1, 255]")
    require(pixels.length == width * height * 3,
      s"pixel plane ${pixels.length} != ${width * height * 3}")
    val header = s"P6\n$width $height\n$maxVal\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(pixels, 0, out, header.length, pixels.length)
    out
  }

  /** Parse a P6 binary PPM: magic, then three header integers separated
    * by whitespace with `#`-to-end-of-line comments allowed anywhere
    * whitespace is (the Netpbm grammar), then a SINGLE whitespace byte,
    * then the raw plane. maxval ≥ 256 (2-byte samples) is rejected as
    * unsupported rather than mis-read.
    */
  def decodePpm(bytes: Array[Byte]): PpmImage = decodePpmAt(bytes, 0)._1

  /** Parse ONE P6 image starting at `start`, returning the image and the
    * position one past its plane — the primitive a multi-frame image
    * stream ([[decodePpmStream]]) walks with.
    */
  def decodePpmAt(bytes: Array[Byte], start: Int): (PpmImage, Int) = {
    require(bytes.length >= start + 2 &&
      bytes(start) == 'P' && bytes(start + 1) == '6',
      s"not a P6 PPM payload at byte $start")
    var pos = start + 2
    def isSpace(b: Byte) = b == ' ' || b == '\t' || b == '\n' || b == '\r'
    def skipSeparators(): Unit = {
      var moved = true
      while (moved) {
        moved = false
        while (pos < bytes.length && isSpace(bytes(pos))) { pos += 1; moved = true }
        if (pos < bytes.length && bytes(pos) == '#') {
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
          moved = true
        }
      }
    }
    def readInt(): Int = {
      skipSeparators()
      require(pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9',
        s"expected header integer at byte $pos")
      var v = 0
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); pos += 1
      }
      v
    }
    val (w, h, maxVal) = (readInt(), readInt(), readInt())
    require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
    require(maxVal > 0 && maxVal < 256,
      s"maxval $maxVal unsupported (2-byte samples)")
    // exactly ONE whitespace byte terminates the header (per the spec —
    // a pixel plane may legally begin with a '#' or space BYTE VALUE)
    require(pos < bytes.length && isSpace(bytes(pos)),
      "missing header-terminating whitespace")
    pos += 1
    val need = w * h * 3
    require(bytes.length - pos >= need,
      s"truncated plane: ${bytes.length - pos} of $need bytes")
    (PpmImage(w, h, maxVal,
      java.util.Arrays.copyOfRange(bytes, pos, pos + need)), pos + need)
  }

  /** Decode a concatenated-P6 image stream (the MJPEG shape for the
    * uncompressed Netpbm family: frame after frame, each a complete P6
    * file): walk [[decodePpmAt]] until the bytes are exhausted. Trailing
    * garbage fails loudly (a partial frame is a truncation, not EOF).
    */
  def decodePpmStream(bytes: Array[Byte]): IndexedSeq[PpmImage] = {
    val frames = IndexedSeq.newBuilder[PpmImage]
    var pos = 0
    while (pos < bytes.length) {
      val (img, next) = decodePpmAt(bytes, pos)
      frames += img
      pos = next
    }
    frames.result()
  }

  // ---------------------------------------------------------------- WAV

  /** Encode a PCM 16-bit RIFF/WAVE file (standard 44-byte header when no
    * extra chunks precede `data`).
    */
  def encodeWav(channels: Int, sampleRate: Int,
      samples: Array[Short]): Array[Byte] = {
    require(channels > 0 && sampleRate > 0, "bad WAV format fields")
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    bb.put("RIFF".getBytes(ascii)).putInt(36 + dataLen)
      .put("WAVE".getBytes(ascii))
    bb.put("fmt ".getBytes(ascii)).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16.toShort)              // bits per sample
    bb.put("data".getBytes(ascii)).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Parse a RIFF/WAVE PCM payload by walking the chunk list: RIFF
    * magic + WAVE form type, then chunks `(fourcc, size, body)` until
    * both `fmt ` and `data` are found — unknown chunks (LIST, fact,
    * cue …) are skipped by their declared size, with the spec's odd-size
    * pad byte honored. Only integer-PCM (format tag 1), 16 bits per
    * sample is decoded; anything else fails loudly.
    */
  def decodeWav(bytes: Array[Byte]): WavAudio = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); bb.get(b)
      new String(b, java.nio.charset.StandardCharsets.US_ASCII)
    }
    require(bytes.length >= 12, "truncated RIFF header")
    require(fourcc() == "RIFF", "not a RIFF payload")
    bb.getInt // declared RIFF size — files in the wild lie; ignored
    require(fourcc() == "WAVE", "RIFF form is not WAVE")
    var fmt: Option[(Int, Int, Int, Int)] = None // tag, ch, rate, bits
    var data: Option[Array[Byte]] = None
    while ((fmt.isEmpty || data.isEmpty) && bb.remaining() >= 8) {
      val id = fourcc()
      val size = bb.getInt
      require(size >= 0 && size <= bb.remaining(),
        s"chunk '$id' declares $size bytes, ${bb.remaining()} remain")
      val body = new Array[Byte](size); bb.get(body)
      if (size % 2 == 1 && bb.remaining() > 0) bb.get() // RIFF pad byte
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too small ($size)")
          val fb = java.nio.ByteBuffer.wrap(body)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          fmt = Some((fb.getShort & 0xFFFF, fb.getShort & 0xFFFF,
            fb.getInt, { fb.getInt; fb.getShort; fb.getShort & 0xFFFF }))
        case "data" => data = Some(body)
        case _ => // unknown chunk: skipped by size, as the spec requires
      }
    }
    val (tag, channels, rate, bits) = fmt.getOrElse(
      throw new IllegalArgumentException("no fmt chunk"))
    val d = data.getOrElse(throw new IllegalArgumentException("no data chunk"))
    require(tag == 1, s"format tag $tag unsupported (integer PCM only)")
    require(bits == 16, s"$bits bits/sample unsupported (16-bit only)")
    require(d.length % 2 == 0, s"odd PCM16 data length ${d.length}")
    val sb = java.nio.ByteBuffer.wrap(d)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).asShortBuffer()
    val samples = new Array[Short](d.length / 2)
    sb.get(samples)
    WavAudio(channels, rate, bits, samples)
  }
}
