package graft.tools

import java.nio.file.{Files, Paths}

/** Reference-CLI conformance dump for the zstd encoders: writes a
  * battery of engine-emitted frames (`.zst` + the expected `.raw`
  * content) so the reference zstd CLI can be run over them — the
  * encode-side counterpart of the decoder's CLI goldens. Each frame is
  * also round-tripped through the engine's own decoder first, so a
  * failure under the CLI isolates an encoder bug, not a decode one.
  *
  * Usage: runMain graft.tools.ZstdConformance [outDir]
  */
object ZstdConformance {
  def main(args: Array[String]): Unit = {
    val dir = Paths.get(if (args.nonEmpty) args(0) else "/tmp/zstdcases")
    Files.createDirectories(dir)
    val rnd = new scala.util.Random(5)
    var i = 0
    def asc(n: Int): Array[Byte] =
      Array.fill(n)((32 + rnd.nextInt(95)).toByte)
    val payloads: Seq[Array[Byte]] = Seq(
      "ab".getBytes("US-ASCII"),
      "the quick brown fox".getBytes("US-ASCII"),
      asc(100), asc(1023), asc(1024), asc(5000), asc(16383),
      ("word " * 400).getBytes("US-ASCII"))
    for (p <- payloads; nSeq <- Seq(1, 2, 3, 7) if p.length >= nSeq) {
      val frame = graft.web.Zstd.encodeEntropyFrameFse(p, nSeq,
        matchPad = 16, rleLen = 16)
      val s = graft.web.Zstd.decodeStream(frame)
      val got = s.frames.head.content
      // expected content: chunks + per-chunk pads + RLE tail
      val ends = graft.web.ZstdEntropy.fseChunkEnds(p.length, nSeq)
      val exp = new java.io.ByteArrayOutputStream()
      var k = 0
      while (k < nSeq) {
        val from = if (k == 0) 0 else ends(k - 1)
        exp.write(p, from, ends(k) - from)
        var j = 0
        while (j < 16) { exp.write(p(ends(k) - 1) & 0xFF); j += 1 }
        k += 1
      }
      var j = 0
      while (j < 16) { exp.write('~'); j += 1 }
      require(java.util.Arrays.equals(got, exp.toByteArray),
        s"self-decode mismatch for payload ${p.length} nSeq $nSeq")
      Files.write(dir.resolve(f"$i%03d.zst"), frame)
      Files.write(dir.resolve(f"$i%03d.raw"), exp.toByteArray)
      i += 1
    }
    println(s"wrote $i conformance frames to $dir (all self-decoded)")
  }
}
