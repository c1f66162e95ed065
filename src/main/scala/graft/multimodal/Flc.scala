package graft.multimodal

/** From-scratch FLIC (FLC) codec — the video tier's genuinely
  * INTER-FRAME-compressed container, beside MJPEG's independent frames
  * (`Codecs.decodeJpegStream`). FLC is the Autodesk Animator Pro
  * animation format (public specification; see the Animator Pro file
  * format docs / multimedia.cx FLIC description): a 128-byte header,
  * then per-frame chunks whose sub-chunks carry an 8-bit palettized
  * frame either whole (BYTE_RUN line RLE, FLI_COPY raw) or — the point
  * of the format — as a sparse DELTA against the decoder's PERSISTENT
  * frame buffer (DELTA_FLC word packets with line skips). Everything is
  * integer-deterministic and lossless, so a second engine predicts every
  * decoded statistic exactly.
  *
  * Reference behavior anchor: the reference pipeline treats media as
  * opaque payloads (scraping_jobsdb stores raw HTML bodies; see
  * `/root/reference/spark/ParseHtml.py:44-52`) — the decode tier itself
  * is beyond-reference scope, built to the public FLIC spec.
  *
  * Scope, by contract: FLC (magic 0xAF12) only — FLI (0xAF11) uses
  * different chunk encodings and is rejected loudly. Sub-chunk surface:
  * COLOR_256 (4), DELTA_FLC (7), BYTE_RUN (15), FLI_COPY (16) decode;
  * PSTAMP (18) is skipped by declared size per the spec ("ignorable
  * postage-stamp preview"); any other sub-chunk type fails loudly.
  * The encoder emits COLOR_256 + BYTE_RUN on the first frame and a
  * genuinely DIFFED DELTA_FLC per subsequent frame (only changed words
  * travel; an unchanged frame is an empty frame chunk). Decoder handles
  * the odd-width last-byte opcode (top bits 10); the encoder requires
  * even width and never emits it.
  */
object Flc {
  import Codecs.PpmImage

  private val FlcMagic = 0xAF12
  private val FrameMagic = 0xF1FA
  private val ChunkColor256 = 4
  private val ChunkDeltaFlc = 7
  private val ChunkByteRun = 15
  private val ChunkCopy = 16
  private val ChunkPstamp = 18

  // ------------------------------------------------------------ encode

  /** Encode a frame sequence as an FLC animation. Each frame is a
    * width*height plane of 8-bit palette indices; `palette` is 256 RGB
    * triples (768 bytes) written as one COLOR_256 chunk on the first
    * frame. Frame 1 is BYTE_RUN-compressed whole; every later frame is
    * a DELTA_FLC diff against its predecessor — lines with no changed
    * words are line-skipped, changed words travel as literal-run or
    * replicate packets, and a frame identical to its predecessor
    * becomes an empty frame chunk (the spec's repeat-frame idiom).
    */
  def encodeFlc(width: Int, height: Int, palette: Array[Byte],
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xFFFF && height <= 0xFFFF,
      s"bad dimensions ${width}x$height")
    require(width % 2 == 0, s"encoder requires even width, got $width")
    require(palette.length == 768, s"palette ${palette.length} != 768")
    require(frames.nonEmpty, "no frames")
    require(frames.size <= 0xFFFF, s"${frames.size} frames > 65535")
    frames.zipWithIndex.foreach { case (f, i) =>
      require(f.length == width * height,
        s"frame $i plane ${f.length} != ${width * height}")
    }

    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >>> 8) & 0xFF) }
    def u32(v: Int): Unit = { u16(v & 0xFFFF); u16((v >>> 16) & 0xFFFF) }

    // 128-byte header; size is patched at the end.
    u32(0); u16(FlcMagic); u16(frames.size); u16(width); u16(height)
    u16(8) /* depth */ ; u16(3) /* flags: finished+looped */
    u32(66) /* speed, ms/frame */ ; u16(0) /* reserved */
    u32(0); u32(0); u32(0); u32(0) // created/creator/updated/updater
    u16(1); u16(1) // aspect ratio
    var pad = 0
    while (pad < 38) { out.write(0); pad += 1 } // reserved
    u32(0); u32(0) // oframe1/oframe2 (optional fast-seek offsets; unused)
    pad = 0
    while (pad < 40) { out.write(0); pad += 1 } // reserved
    require(out.size == 128, s"header ${out.size} != 128 bytes")

    var prev: Array[Byte] = null
    for ((frame, fi) <- frames.zipWithIndex) {
      val chunks = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      if (fi == 0) {
        chunks += colorChunk(palette)
        chunks += byteRunChunk(width, height, frame)
      } else {
        val delta = deltaFlcChunk(width, height, prev, frame)
        delta.foreach(chunks += _)
      }
      val body = chunks.map(_.length).sum
      u32(16 + body); u16(FrameMagic); u16(chunks.size)
      pad = 0
      while (pad < 8) { out.write(0); pad += 1 }
      chunks.foreach(c => out.write(c))
      prev = frame
    }

    val bytes = out.toByteArray
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0, bytes.length)
    bytes
  }

  /** One COLOR_256 chunk: a single packet replacing all 256 entries
    * (skip 0, count byte 0 = 256 per the spec), 8-bit RGB values.
    */
  private def colorChunk(palette: Array[Byte]): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    body.write(1); body.write(0) // u16 packet count = 1
    body.write(0) // skip 0
    body.write(0) // count 0 => 256 entries
    body.write(palette, 0, 768)
    subChunk(ChunkColor256, body.toByteArray)
  }

  /** BYTE_RUN: per line, a legacy packet-count byte (decoders ignore
    * it; we write the true count when it fits a byte, else 0), then
    * signed-count packets — positive = replicate the next byte count
    * times, negative = |count| literal bytes — until the line is full.
    * Runs of >= 3 equal bytes become replicates; shorter stretches pool
    * into literal packets. Both packet kinds cap at 127.
    */
  private def byteRunChunk(width: Int, height: Int,
      frame: Array[Byte]): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    var y = 0
    while (y < height) {
      val line = new java.io.ByteArrayOutputStream()
      var packets = 0
      var x = 0
      while (x < width) {
        var run = 1
        while (x + run < width && frame(y * width + x + run) ==
          frame(y * width + x) && run < 127) run += 1
        if (run >= 3) {
          line.write(run); line.write(frame(y * width + x))
          packets += 1; x += run
        } else {
          // literal stretch: until the next >=3 run or 127 bytes
          var lit = run
          var cont = true
          while (cont && x + lit < width && lit < 127) {
            var r2 = 1
            while (x + lit + r2 < width && frame(y * width + x + lit + r2) ==
              frame(y * width + x + lit) && r2 < 3) r2 += 1
            if (r2 >= 3) cont = false
            else lit = math.min(127, lit + r2)
          }
          line.write(-lit & 0xFF)
          line.write(frame, y * width + x, lit)
          packets += 1; x += lit
        }
      }
      body.write(if (packets <= 255) packets else 0)
      val lb = line.toByteArray
      body.write(lb, 0, lb.length)
      y += 1
    }
    subChunk(ChunkByteRun, body.toByteArray)
  }

  /** DELTA_FLC (SS2): u16 line-entry count, then per changed line:
    * optional negative line-skip words (top bits 11), a packet-count
    * word (top bits 00), then packets — u8 column skip (pixels),
    * s8 word count: positive = that many literal words follow,
    * negative = one word follows, replicated |count| times. Unchanged
    * lines never travel; a fully unchanged frame returns None (empty
    * frame chunk = repeat). Changed words are found by genuine
    * word-wise diff against the previous frame.
    */
  private def deltaFlcChunk(width: Int, height: Int, prev: Array[Byte],
      frame: Array[Byte]): Option[Array[Byte]] = {
    val wordsPerLine = width / 2
    val body = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { body.write(v & 0xFF); body.write((v >>> 8) & 0xFF) }
    var entries = 0
    var lastWritten = -1
    var y = 0
    while (y < height) {
      // changed word spans on this line
      val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var w = 0
      while (w < wordsPerLine) {
        val off = y * width + 2 * w
        if (frame(off) != prev(off) || frame(off + 1) != prev(off + 1)) {
          var e = w + 1
          while (e < wordsPerLine && {
            val o2 = y * width + 2 * e
            frame(o2) != prev(o2) || frame(o2 + 1) != prev(o2 + 1)
          }) e += 1
          spans += ((w, e)); w = e
        } else w += 1
      }
      if (spans.nonEmpty) {
        var skip = y - lastWritten - 1
        while (skip > 0) {
          val s = math.min(skip, 0x3FFF)
          u16((-s) & 0xFFFF) // top bits 11: negative line skip
          skip -= s
        }
        // packets, splitting long spans at the 127-word / 255-skip caps
        val packets = scala.collection.mutable
          .ArrayBuffer.empty[(Int, Int, Int)] // (colSkipPx, startWord, nWords)
        var col = 0 // current column in pixels
        for ((s0, e0) <- spans) {
          var s = s0
          while (s < e0) {
            var px = 2 * s - col
            while (px > 255) { // rare: bridge with a zero-length... not
              // expressible; instead split via an extra packet at cap
              packets += ((255, s, 0)); col += 255; px -= 255
            }
            val n = math.min(e0 - s, 127)
            packets += ((px, s, n))
            col = 2 * s + 2 * n
            s += n
          }
        }
        // the count word's top two bits are opcode space (01/10/11);
        // a count above 0x3FFF would be misread as a different opcode
        require(packets.size <= 0x3FFF,
          s"DELTA_FLC line $y needs ${packets.size} packets; " +
            "the 14-bit packet-count field caps at 16383")
        u16(packets.size) // top bits 00: packet count
        for ((px, s, n) <- packets) {
          body.write(px)
          if (n == 0) body.write(0)
          else {
            // replicate when every word in the span is identical and n>1
            val base = y * width + 2 * s
            var same = n > 1
            var k = 1
            while (same && k < n) {
              same = frame(base + 2 * k) == frame(base) &&
                frame(base + 2 * k + 1) == frame(base + 1)
              k += 1
            }
            if (same) {
              body.write(-n & 0xFF)
              body.write(frame(base)); body.write(frame(base + 1))
            } else {
              body.write(n)
              body.write(frame, base, 2 * n)
            }
          }
        }
        entries += 1
        lastWritten = y
      }
      y += 1
    }
    if (entries == 0) None
    else {
      val full = new java.io.ByteArrayOutputStream()
      full.write(entries & 0xFF); full.write((entries >>> 8) & 0xFF)
      val lb = body.toByteArray
      full.write(lb, 0, lb.length)
      Some(subChunk(ChunkDeltaFlc, full.toByteArray))
    }
  }

  /** Wrap a sub-chunk: u32 size (header + body + pad), u16 type, body,
    * one zero pad byte when the total would be odd (Animator pads
    * chunks to even sizes; the declared size includes the pad so
    * walkers stay aligned).
    */
  private def subChunk(chunkType: Int, chunkBody: Array[Byte]): Array[Byte] = {
    val padded = (6 + chunkBody.length + 1) / 2 * 2
    val bb = java.nio.ByteBuffer.allocate(padded)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(padded).putShort(chunkType.toShort).put(chunkBody)
    bb.array()
  }

  // ------------------------------------------------------------ decode

  /** Decode an FLC animation into RGB frames via the persistent frame
    * buffer + palette — each returned [[Codecs.PpmImage]] is the
    * buffer state after that frame's chunks applied (a frame chunk
    * with no pixel sub-chunks repeats the previous frame, per the
    * spec). Malformed payloads — bad magic, sub-chunk overrun, a
    * delta packet past the line end, trailing garbage — fail loudly;
    * a declared header size that disagrees with the payload is a lie
    * and also fails.
    */
  def decodeFlc(bytes: Array[Byte]): IndexedSeq[PpmImage] = {
    require(bytes.length >= 128, s"truncated FLIC header (${bytes.length})")
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val declared = bb.getInt(0)
    require(declared == bytes.length,
      s"header size $declared != payload ${bytes.length}")
    val magic = bb.getShort(4) & 0xFFFF
    require(magic != 0xAF11, "FLI (0xAF11) uses different chunk encodings")
    require(magic == FlcMagic, f"bad FLIC magic 0x$magic%04X")
    val nFrames = bb.getShort(6) & 0xFFFF
    val width = bb.getShort(8) & 0xFFFF
    val height = bb.getShort(10) & 0xFFFF
    val depth = bb.getShort(12) & 0xFFFF
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(depth == 8, s"depth $depth unsupported (8-bit palettized only)")

    val buf = new Array[Byte](width * height)
    val palette = new Array[Byte](768)
    val frames = IndexedSeq.newBuilder[PpmImage]
    var pos = 128
    var f = 0
    while (f < nFrames) {
      require(pos + 16 <= bytes.length, s"truncated frame chunk $f")
      val fSize = bb.getInt(pos)
      val fType = bb.getShort(pos + 4) & 0xFFFF
      require(fType == FrameMagic, f"frame $f%d: bad chunk type 0x$fType%04X")
      require(fSize >= 16 && pos + fSize <= bytes.length,
        s"frame $f chunk size $fSize overruns payload")
      val nChunks = bb.getShort(pos + 6) & 0xFFFF
      var p = pos + 16
      var c = 0
      while (c < nChunks) {
        require(p + 6 <= pos + fSize, s"frame $f sub-chunk $c overruns frame")
        val sSize = bb.getInt(p)
        val sType = bb.getShort(p + 4) & 0xFFFF
        require(sSize >= 6 && p + sSize <= pos + fSize,
          s"frame $f sub-chunk $c size $sSize overruns frame")
        sType match {
          case ChunkColor256 => applyColor256(bytes, p + 6, p + sSize, palette)
          case ChunkByteRun => applyByteRun(bytes, p + 6, p + sSize, width,
            height, buf)
          case ChunkDeltaFlc => applyDeltaFlc(bytes, p + 6, p + sSize, width,
            height, buf)
          case ChunkCopy =>
            require(sSize - 6 >= width * height,
              s"FLI_COPY ${sSize - 6} bytes < plane ${width * height}")
            System.arraycopy(bytes, p + 6, buf, 0, width * height)
          case ChunkPstamp => () // ignorable preview, skip by size
          case other => throw new IllegalArgumentException(
            s"frame $f: unsupported sub-chunk type $other")
        }
        p += sSize
        c += 1
      }
      // palette indices -> RGB snapshot
      val rgb = new Array[Byte](width * height * 3)
      var i = 0
      while (i < buf.length) {
        val idx = (buf(i) & 0xFF) * 3
        rgb(i * 3) = palette(idx)
        rgb(i * 3 + 1) = palette(idx + 1)
        rgb(i * 3 + 2) = palette(idx + 2)
        i += 1
      }
      frames += PpmImage(width, height, 255, rgb)
      pos += fSize
      f += 1
    }
    require(pos == bytes.length,
      s"${bytes.length - pos} trailing bytes after frame $nFrames")
    frames.result()
  }

  private def applyColor256(bytes: Array[Byte], from: Int, end: Int,
      palette: Array[Byte]): Unit = {
    require(from + 2 <= end, "truncated COLOR_256 chunk")
    val nPackets = (bytes(from) & 0xFF) | ((bytes(from + 1) & 0xFF) << 8)
    var p = from + 2
    var idx = 0
    var k = 0
    while (k < nPackets) {
      require(p + 2 <= end, s"truncated COLOR_256 packet $k")
      idx += bytes(p) & 0xFF
      val rawCount = bytes(p + 1) & 0xFF
      val count = if (rawCount == 0) 256 else rawCount
      require(idx + count <= 256, s"COLOR_256 packet $k past entry 256")
      require(p + 2 + 3 * count <= end, s"truncated COLOR_256 packet $k body")
      System.arraycopy(bytes, p + 2, palette, idx * 3, 3 * count)
      idx += count
      p += 2 + 3 * count
      k += 1
    }
  }

  private def applyByteRun(bytes: Array[Byte], from: Int, end: Int,
      width: Int, height: Int, buf: Array[Byte]): Unit = {
    var p = from
    var y = 0
    while (y < height) {
      require(p < end, s"truncated BYTE_RUN at line $y")
      p += 1 // legacy per-line packet count: ignored per the spec
      var x = 0
      while (x < width) {
        require(p < end, s"truncated BYTE_RUN packet at line $y col $x")
        val count = bytes(p); p += 1
        if (count > 0) { // replicate
          require(x + count <= width, s"BYTE_RUN run past line $y end")
          require(p < end, s"truncated BYTE_RUN replicate at line $y")
          java.util.Arrays.fill(buf, y * width + x, y * width + x + count,
            bytes(p))
          p += 1; x += count
        } else if (count < 0) { // literal copy
          val n = -count
          require(x + n <= width, s"BYTE_RUN literal past line $y end")
          require(p + n <= end, s"truncated BYTE_RUN literal at line $y")
          System.arraycopy(bytes, p, buf, y * width + x, n)
          p += n; x += n
        } else throw new IllegalArgumentException(
          s"BYTE_RUN zero-count packet at line $y")
      }
      y += 1
    }
  }

  private def applyDeltaFlc(bytes: Array[Byte], from: Int, end: Int,
      width: Int, height: Int, buf: Array[Byte]): Unit = {
    def u16(at: Int): Int = {
      require(at + 2 <= end, "truncated DELTA_FLC word")
      (bytes(at) & 0xFF) | ((bytes(at + 1) & 0xFF) << 8)
    }
    val nEntries = u16(from)
    var p = from + 2
    var y = 0
    var k = 0
    while (k < nEntries) {
      // opcode words: 11 = line skip, 10 = odd-width last byte,
      // 00 = packet count (ends the opcode run)
      var nPackets = -1
      while (nPackets < 0) {
        val op = u16(p); p += 2
        (op >>> 14) match {
          case 3 => y += 0x10000 - op // negative line skip
          case 2 => // low byte into the last pixel of the current line
            require(y < height, s"DELTA_FLC last-byte opcode past line $height")
            buf(y * width + width - 1) = (op & 0xFF).toByte
          case 0 => nPackets = op
          case _ => throw new IllegalArgumentException(
            f"DELTA_FLC opcode 0x$op%04X (type 01) is undefined")
        }
      }
      require(y < height, s"DELTA_FLC line $y past height $height")
      var x = 0
      var j = 0
      while (j < nPackets) {
        require(p + 2 <= end, s"truncated DELTA_FLC packet $j on line $y")
        x += bytes(p) & 0xFF
        val count = bytes(p + 1); p += 2
        if (count > 0) { // literal words
          require(x + 2 * count <= width, s"DELTA_FLC literal past line $y end")
          require(p + 2 * count <= end, s"truncated DELTA_FLC literal, line $y")
          System.arraycopy(bytes, p, buf, y * width + x, 2 * count)
          p += 2 * count; x += 2 * count
        } else if (count < 0) { // replicate one word
          val n = -count
          require(x + 2 * n <= width, s"DELTA_FLC replicate past line $y end")
          require(p + 2 <= end, s"truncated DELTA_FLC replicate, line $y")
          var r = 0
          while (r < n) {
            buf(y * width + x + 2 * r) = bytes(p)
            buf(y * width + x + 2 * r + 1) = bytes(p + 1)
            r += 1
          }
          p += 2; x += 2 * n
        } // count == 0: a column-skip bridge (no pixels) — legal no-op
        j += 1
      }
      y += 1
      k += 1
    }
    require(p <= end, "DELTA_FLC overran its chunk")
  }
}
