package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Flc

/** The FLC inter-frame video codec: a HAND-ASSEMBLED golden animation
  * (hand-traced BYTE_RUN packets, DELTA_FLC line skip / replicate /
  * last-byte opcodes — not a round-trip, so a matched encode/decode bug
  * cannot cancel), encoder round-trips incl. the wide-row column-skip
  * bridge, delta-sparsity assertions on the wire bytes, the synthesis
  * contract's sliding-window algebra, and loud failures for malformed
  * payloads.
  */
class FlcSpec extends AnyFunSuite {

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >>> 8) & 0xFF).toByte)
  private def le32(v: Int): Array[Byte] = le16(v & 0xFFFF) ++ le16(v >>> 16)

  private def header(size: Int, frames: Int, w: Int, h: Int): Array[Byte] = {
    val b = new Array[Byte](128)
    val bb = java.nio.ByteBuffer.wrap(b)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(size).putShort(0xAF12.toShort).putShort(frames.toShort)
      .putShort(w.toShort).putShort(h.toShort).putShort(8.toShort)
      .putShort(3.toShort).putInt(66)
    b
  }

  /** Grayscale identity palette and its RGB expansion. */
  private val grayPalette: Array[Byte] = {
    val p = new Array[Byte](768)
    var i = 0
    while (i < 256) {
      p(3 * i) = i.toByte; p(3 * i + 1) = i.toByte; p(3 * i + 2) = i.toByte
      i += 1
    }
    p
  }

  private def rgbOf(indices: Array[Byte], palette: Array[Byte]): Seq[Byte] =
    indices.toSeq.flatMap { ix =>
      val i = (ix & 0xFF) * 3
      Seq(palette(i), palette(i + 1), palette(i + 2))
    }

  // ------------------------------------------------ hand-traced golden

  test("golden FLC: hand-assembled 4x2 two-frame animation — COLOR_256 " +
      "skip packet, BYTE_RUN run+literal, DELTA_FLC line skip, " +
      "replicate packet, and the odd-width last-byte opcode") {
    // palette: entry 1 = (10,20,30), entry 2 = (40,50,60) via skip=1
    val color = le32(16) ++ le16(4) ++ le16(1) ++
      Array[Byte](1, 2, 10, 20, 30, 40, 50, 60)
    assert(color.length === 16)
    // frame 1 indices: row0 = [1,1,1,2], row1 = [0,0,0,0]
    val byteRun = le32(14) ++ le16(15) ++ Array[Byte](
      2, /* line 0: */ 3, 1, -1, 2,
      1, /* line 1: */ 4, 0)
    assert(byteRun.length === 14)
    val frame1 = le32(16 + 16 + 14) ++ le16(0xF1FA) ++ le16(2) ++
      new Array[Byte](8) ++ color ++ byteRun
    // frame 2: skip line 0; on line 1: last-byte opcode 0x8002 sets
    // pixel 3 = index 2, then one packet replicating word (1,1) once
    // => row1 becomes [1,1,0,2]
    val delta = le32(18) ++ le16(7) ++
      le16(1) ++ // one line entry
      le16(0xFFFF) ++ // line skip -1
      le16(0x8002) ++ // last-byte opcode
      le16(1) ++ // one packet
      Array[Byte](0, -1, 1, 1)
    assert(delta.length === 18)
    val frame2 = le32(16 + 18) ++ le16(0xF1FA) ++ le16(1) ++
      new Array[Byte](8) ++ delta
    val total = 128 + frame1.length + frame2.length
    val bytes = header(total, 2, 4, 2) ++ frame1 ++ frame2
    assert(bytes.length === total)

    val frames = Flc.decodeFlc(bytes)
    assert(frames.length === 2)
    assert(frames(0).width === 4 && frames(0).height === 2)
    val pal = new Array[Byte](768)
    pal(3) = 10; pal(4) = 20; pal(5) = 30
    pal(6) = 40; pal(7) = 50; pal(8) = 60
    assert(frames(0).pixels.toSeq ===
      rgbOf(Array[Byte](1, 1, 1, 2, 0, 0, 0, 0), pal))
    assert(frames(1).pixels.toSeq ===
      rgbOf(Array[Byte](1, 1, 1, 2, 1, 1, 0, 2), pal))
  }

  test("golden FLC: an empty frame chunk repeats the previous frame, " +
      "and FLI_COPY replaces the whole buffer") {
    val copyBody = Array[Byte](5, 6, 7, 8) // 2x2 plane
    val copy = le32(6 + 4) ++ le16(16) ++ copyBody
    val f1 = le32(16 + 10) ++ le16(0xF1FA) ++ le16(1) ++
      new Array[Byte](8) ++ copy
    val f2 = le32(16) ++ le16(0xF1FA) ++ le16(0) ++ new Array[Byte](8)
    val total = 128 + f1.length + f2.length
    val frames = Flc.decodeFlc(header(total, 2, 2, 2) ++ f1 ++ f2)
    assert(frames.length === 2)
    // no palette chunk: all entries stay (0,0,0)
    assert(frames(0).pixels.toSeq === Seq.fill(12)(0.toByte))
    assert(frames(1).pixels.toSeq === frames(0).pixels.toSeq)
  }

  // ------------------------------------------------------- round-trips

  private def roundTrip(w: Int, h: Int, frames: Seq[Array[Byte]]): Unit = {
    val bytes = Flc.encodeFlc(w, h, grayPalette, frames)
    val out = Flc.decodeFlc(bytes)
    assert(out.length === frames.length)
    for ((f, i) <- frames.zipWithIndex)
      assert(out(i).pixels.toSeq === rgbOf(f, grayPalette),
        s"frame $i mismatch")
  }

  test("round-trip: deterministic pseudo-random frames with sparse and " +
      "dense inter-frame changes survive encode/decode exactly") {
    val rnd = new scala.util.Random(0xF11C)
    for (trial <- 0 until 20) {
      val w = 2 * (1 + rnd.nextInt(20)) // even widths 2..40
      val h = 1 + rnd.nextInt(9)
      val nf = 1 + rnd.nextInt(6)
      var prev = Array.fill(w * h)(rnd.nextInt(256).toByte)
      val frames = Seq.newBuilder[Array[Byte]]
      frames += prev
      for (_ <- 1 until nf) {
        val next = java.util.Arrays.copyOf(prev, prev.length)
        val changes = rnd.nextInt(3) match {
          case 0 => 0 // identical frame: the empty-chunk repeat path
          case 1 => 1 + rnd.nextInt(3) // sparse delta
          case _ => w * h / 2 // dense delta
        }
        for (_ <- 0 until changes)
          next(rnd.nextInt(w * h)) = rnd.nextInt(256).toByte
        frames += next
        prev = next
      }
      roundTrip(w, h, frames.result())
    }
  }

  test("round-trip: runs that exercise BYTE_RUN replicate/literal " +
      "boundaries (uniform, alternating, 127-run caps)") {
    val w = 300; val h = 3
    val uniform = Array.fill(w * h)(7.toByte)
    val alternating = Array.tabulate(w * h)(i => (i % 2).toByte)
    val longRuns = Array.tabulate(w * h)(i => (i / 130).toByte)
    roundTrip(w, h, Seq(uniform, alternating, longRuns))
  }

  test("round-trip: a changed word beyond column 255 exercises the " +
      "DELTA_FLC column-skip bridge") {
    val w = 600; val h = 2
    val f1 = new Array[Byte](w * h)
    val f2 = java.util.Arrays.copyOf(f1, f1.length)
    f2(0) = 9 // word 0 changes
    f2(580) = 11 // word 290: 578-pixel gap > 255 forces bridge packets
    f2(w + 599) = 13 // line 2, last word
    roundTrip(w, h, Seq(f1, f2))
  }

  // -------------------------------------------------- delta sparsity

  test("the wire is genuinely inter-frame: an unchanged frame is an " +
      "empty 16-byte chunk and a one-row change travels as one small " +
      "delta, not a keyframe") {
    val w = 16; val h = 4
    val f1 = Array.tabulate(w * h)(i => (i % 251).toByte)
    val f2 = java.util.Arrays.copyOf(f1, f1.length) // identical
    val f3 = java.util.Arrays.copyOf(f2, f2.length)
    var i = 0
    while (i < 16) { f3(2 * w + i) = (200 - i).toByte; i += 1 } // row 2
    val bytes = Flc.encodeFlc(w, h, grayPalette, Seq(f1, f2, f3))
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val f1Size = bb.getInt(128)
    val f2At = 128 + f1Size
    assert(bb.getInt(f2At) === 16, "identical frame must be an empty chunk")
    assert((bb.getShort(f2At + 6) & 0xFFFF) === 0)
    val f3At = f2At + 16
    val f3Size = bb.getInt(f3At)
    // one line entry: 16 changed pixels = 8 literal words + opcodes —
    // far below the ~84-byte BYTE_RUN keyframe floor for this plane
    assert(f3Size <= 16 + 6 + 2 + 2 + 2 + 2 + 16 + 2,
      s"one-row delta frame chunk is $f3Size bytes — not sparse")
    assert(128 + f1Size + 16 + f3Size === bytes.length)
    // and it still decodes exactly
    val out = Flc.decodeFlc(bytes)
    assert(out(2).pixels.toSeq === rgbOf(f3, grayPalette))
  }

  test("synthesis contract: the decoded frame sum is 3x the sliding " +
      "4-window of slice sums (rows persist until their residue " +
      "rewrites)") {
    // build frames exactly as Multimodal.flcFromText does
    val text = "The quick brown fox jumps over the lazy dog, twice over."
    val ascii = text.getBytes("US-ASCII")
    val nf = math.max(1, (ascii.length + 15) / 16)
    val frames = new Array[Array[Byte]](nf)
    for (f <- 0 until nf) {
      val plane = if (f == 0) new Array[Byte](64)
        else java.util.Arrays.copyOf(frames(f - 1), 64)
      java.util.Arrays.fill(plane, 16 * (f % 4), 16 * (f % 4 + 1), 0.toByte)
      val n = math.max(0, math.min(16, ascii.length - f * 16))
      if (n > 0) System.arraycopy(ascii, f * 16, plane, 16 * (f % 4), n)
      frames(f) = plane
    }
    val out = Flc.decodeFlc(Flc.encodeFlc(16, 4, grayPalette, frames.toSeq))
    def sliceSum(g: Int): Long = {
      var s = 0L
      for (j <- 16 * g until math.min(16 * g + 16, ascii.length)) s += ascii(j)
      s
    }
    for (f <- 0 until nf) {
      val want = 3L * (math.max(0, f - 3) to f).map(sliceSum).sum
      val got = out(f).pixels.map(_ & 0xFF).map(_.toLong).sum
      assert(got === want, s"frame $f sum")
    }
  }

  // ------------------------------------------------------ loud failures

  test("loud failures: FLI magic, size lie, trailing garbage, delta " +
      "past line end, unknown sub-chunk, zero-count BYTE_RUN packet") {
    val good = Flc.encodeFlc(4, 2, grayPalette,
      Seq(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)))

    val fli = good.clone(); fli(4) = 0x11.toByte
    val e1 = intercept[IllegalArgumentException](Flc.decodeFlc(fli))
    assert(e1.getMessage.contains("FLI"))

    val lie = good.clone()
    java.nio.ByteBuffer.wrap(lie).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(0, good.length + 4)
    intercept[IllegalArgumentException](Flc.decodeFlc(lie))

    val garbage = good ++ Array[Byte](0, 0, 0)
    intercept[IllegalArgumentException](Flc.decodeFlc(garbage))

    intercept[IllegalArgumentException](
      Flc.decodeFlc(good.take(100))) // truncated header

    // delta past line end: width 4 (2 words), one packet claiming 3
    // literal words
    val delta = le32(6 + 2 + 2 + 2 + 6) ++ le16(7) ++ le16(1) ++ le16(1) ++
      Array[Byte](0, 3, 1, 1, 2, 2, 3, 3)
    val f1 = le32(16 + delta.length) ++ le16(0xF1FA) ++ le16(1) ++
      new Array[Byte](8) ++ delta
    val total = 128 + f1.length
    val e2 = intercept[IllegalArgumentException](
      Flc.decodeFlc(header(total, 1, 4, 2) ++ f1))
    assert(e2.getMessage.contains("past line"))

    // unknown sub-chunk type 99
    val bogus = le32(8) ++ le16(99) ++ Array[Byte](0, 0)
    val f2 = le32(16 + 8) ++ le16(0xF1FA) ++ le16(1) ++
      new Array[Byte](8) ++ bogus
    val e3 = intercept[IllegalArgumentException](
      Flc.decodeFlc(header(128 + f2.length, 1, 4, 2) ++ f2))
    assert(e3.getMessage.contains("unsupported sub-chunk"))

    // BYTE_RUN zero-count packet
    val br = le32(6 + 4) ++ le16(15) ++ Array[Byte](1, 0, 0, 0)
    val f3 = le32(16 + br.length) ++ le16(0xF1FA) ++ le16(1) ++
      new Array[Byte](8) ++ br
    val e4 = intercept[IllegalArgumentException](
      Flc.decodeFlc(header(128 + f3.length, 1, 4, 2) ++ f3))
    assert(e4.getMessage.contains("zero-count"))
  }

  test("encoder contract failures: odd width, wrong plane size, bad " +
      "palette, no frames") {
    intercept[IllegalArgumentException](
      Flc.encodeFlc(5, 2, grayPalette, Seq(new Array[Byte](10))))
    intercept[IllegalArgumentException](
      Flc.encodeFlc(4, 2, grayPalette, Seq(new Array[Byte](7))))
    intercept[IllegalArgumentException](
      Flc.encodeFlc(4, 2, new Array[Byte](10), Seq(new Array[Byte](8))))
    intercept[IllegalArgumentException](
      Flc.encodeFlc(4, 2, grayPalette, Seq.empty))
  }

  test("REGRESSION (r13 packet-count guard): a delta line needing more " +
      "than 16383 packets is REJECTED, not silently written into the " +
      "opcode bit space") {
    // width 65534 -> 32767 words per line; change every second word ->
    // 16384 one-word spans = 16384 packets > 0x3FFF
    val w = 65534
    val f0 = new Array[Byte](w) // height 1
    val f1 = f0.clone()
    var x = 0
    while (x < w) { f1(x) = 1; x += 4 } // first byte of every 2nd word
    val ex = intercept[IllegalArgumentException](
      Flc.encodeFlc(w, 1, grayPalette, Seq(f0, f1)))
    assert(ex.getMessage.contains("packet"),
      s"wrong failure: ${ex.getMessage}")
    // just under the cap still encodes and round-trips: change every
    // second word only in the first half of the line (8192 packets)
    val f2 = f0.clone()
    x = 0
    while (x < w / 2) { f2(x) = 1; x += 4 }
    val ok = Flc.decodeFlc(
      Flc.encodeFlc(w, 1, grayPalette, Seq(f0, f2)))
    assert(ok.size === 2 &&
      ok(1).pixels.count(_ != 0) === 3 * ((w / 2 + 3) / 4),
      "sub-cap wide delta failed to round-trip")
  }
}
