package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Codecs, Mp4}

class Mp4Spec extends AnyFunSuite {

  private val sps = Codecs.H264Sps(profileIdc = 77, levelIdc = 31,
    log2MaxFrameNum = 7, maxNumRefFrames = 4, widthMbs = 16,
    heightMbs = 12, direct8x8 = 1)
  private val slices = Seq((3, 5, 20, 0), (0, 1, 17, 0), (2, 1, 30, 0))
  private def units = Codecs.h264NalUnitsMultiPps(sps,
    Seq(Codecs.DefaultPps), slices)

  test("MP4 round-trip: box tree, avcC parameter sets through the real " +
      "SPS/PPS parsers, samples by length prefix, and every cross-box " +
      "field agrees") {
    val u = units
    val bytes = Mp4.encodeMp4(sps, u(0), u(1), u.drop(2))
    val d = Mp4.decodeMp4(bytes)
    assert(d.nBoxes === 16 && d.nSkipped === 0)
    assert(d.sps === sps)
    assert(d.pps === Codecs.DefaultPps)
    assert(d.samples.size === 3)
    assert(d.samples.map(_.length) === Vector(21, 18, 31)) // 1 + plen
    assert(d.width === 256 && d.height === 192)
    assert(d.timescale === 90000L && d.duration === 3 * 3003L)
    assert(d.totalBytes === bytes.length)
    // avcC really carries the NAL units verbatim
    assert(java.util.Arrays.equals(d.spsNal, u(0)))
    assert(java.util.Arrays.equals(d.ppsNal, u(1)))
  }

  test("the bridge reconstructs the EXACT Annex-B bytes the direct " +
      "encoder writes — two independent paths, one stream") {
    val u = units
    val mp4 = Mp4.encodeMp4(sps, u(0), u(1), u.drop(2))
    val bridged = Mp4.toAnnexB(Mp4.decodeMp4(mp4))
    val direct = Codecs.encodeH264StreamMultiPps(sps,
      Seq(Codecs.DefaultPps), slices)
    assert(java.util.Arrays.equals(bridged, direct),
      "bridge diverged from the direct Annex-B encoding")
    // and the existing walk accepts it end to end
    val s = Codecs.decodeH264Stream(bridged)
    assert(s.nals.map(_.nalType) === Vector(7, 8, 5, 1, 1))
  }

  test("cross-box lies are caught by the consistency contracts, not " +
      "re-synced: lying stsz at the mdat framing, lying stco at the " +
      "chunk landing; unknown boxes are SKIPPED (forward compat)") {
    val u = units
    val badSz = Mp4.encodeMp4(sps, u(0), u(1), u.drop(2), lieStsz = true)
    val e1 = intercept[IllegalArgumentException](Mp4.decodeMp4(badSz))
    assert(e1.getMessage.contains("stsz declares"))
    val badCo = Mp4.encodeMp4(sps, u(0), u(1), u.drop(2), lieStco = true)
    val e2 = intercept[IllegalArgumentException](Mp4.decodeMp4(badCo))
    assert(e2.getMessage.contains("stco chunk offset"))
    // an unknown top-level box ('free') is skipped, counted, and the
    // stco offset contract still resolves relative to the REAL mdat
    val good = Mp4.encodeMp4(sps, u(0), u(1), u.drop(2))
    val free = Array[Byte](0, 0, 0, 12) ++
      "free".getBytes("US-ASCII") ++ Array[Byte](9, 9, 9, 9)
    val withFree = good ++ free
    val d = Mp4.decodeMp4(withFree)
    assert(d.nSkipped === 1)
  }

  test("MP4 hostile-input pin: seeded byte mutations and raw junk " +
      "either parse or raise the contract error class") {
    val u = units
    val good = Mp4.encodeMp4(sps, u(0), u(1), u.drop(2))
    val rnd = new scala.util.Random(0x4D503452)
    var refused = 0
    (0 until 400).foreach { _ =>
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      try Mp4.decodeMp4(b)
      catch {
        case _: IllegalArgumentException => refused += 1
        case other => fail(s"mutation leaked ${other.getClass}: $other")
      }
    }
    assert(refused > 0)
    (0 until 100).foreach { _ =>
      val junk = Array.fill(32 + rnd.nextInt(256))(rnd.nextInt(256).toByte)
      intercept[IllegalArgumentException](Mp4.decodeMp4(junk))
    }
  }
}
