package graft.tools

import java.nio.file.{Files, Paths}

/** Reference-encoder conformance sweep for the RFC 7932 decoder: reads
  * a directory of `NNNN.br` / `NNNN.raw` pairs (streams emitted by the
  * C brotli library across qualities 0-11, window sizes 10-24, and
  * text/font modes) and requires [[graft.web.Brotli.decode]] to
  * reproduce every `.raw` byte-exactly. Also round-trips
  * [[graft.web.Brotli.encodeUncompressed]] over each payload. The spec
  * suite (WebArchiveSpec) pins a fixed subset of these as embedded
  * goldens; this main exists to run arbitrarily large local batteries.
  *
  * Usage: runMain graft.tools.BrotliConformance [caseDir]
  */
object BrotliConformance {
  def main(args: Array[String]): Unit = {
    val dir = Paths.get(if (args.nonEmpty) args(0) else "/tmp/brcases")
    val cases = Files.list(dir).toArray.map(_.toString)
      .filter(_.endsWith(".br")).sorted
    var pass = 0
    var fail = 0
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    for (br <- cases) {
      val raw = br.stripSuffix(".br") + ".raw"
      val comp = Files.readAllBytes(Paths.get(br))
      val expect = Files.readAllBytes(Paths.get(raw))
      try {
        val got = graft.web.Brotli.decode(comp)
        if (java.util.Arrays.equals(got, expect)) pass += 1
        else {
          fail += 1
          var i = 0
          while (i < math.min(got.length, expect.length) &&
            got(i) == expect(i)) i += 1
          failures += s"$br MISMATCH gotLen=${got.length} " +
            s"expLen=${expect.length} firstDiff=$i"
        }
      } catch {
        case e: Throwable =>
          fail += 1
          failures += s"$br EXC ${e.getMessage}"
      }
      // encoder round-trips on the payload (both wire flavors)
      try {
        val enc = graft.web.Brotli.encodeUncompressed(expect)
        val back = graft.web.Brotli.decode(enc)
        if (!java.util.Arrays.equals(back, expect))
          failures += s"$raw ENC-ROUNDTRIP MISMATCH"
        if (expect.length >= 1 && expect.length <= 65536) {
          val comp = graft.web.Brotli.encodeCompressed(expect)
          val back2 = graft.web.Brotli.decode(comp)
          if (!java.util.Arrays.equals(back2, expect))
            failures += s"$raw COMPRESSED-ROUNDTRIP MISMATCH"
          java.nio.file.Files.write(java.nio.file.Paths.get(
            br.stripSuffix(".br") + ".eng.br"), comp)
        }
      } catch {
        case e: Throwable => failures += s"$raw ENC EXC ${e.getMessage}"
      }
    }
    println(s"pass=$pass fail=$fail")
    failures.take(40).foreach(println)
    if (fail > 0 || failures.nonEmpty) sys.exit(1)
  }
}
