package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal.MediaRow

/** ISO-BMFF (MP4, ISO 14496-12) STRUCTURAL layer + the AVC bridge
  * (ISO 14496-15): the container H.264 actually ships in. Synthesis
  * muxes the SAME NAL units the Annex-B tier writes — parameter sets
  * verbatim inside `avcC`, slices length-prefixed as `mdat` samples
  * (a NAL unit includes its emulation-prevention bytes in ANY
  * transport, §7.3.1) — under a genuine box tree:
  * `ftyp / moov { mvhd, trak { tkhd, mdia { mdhd, hdlr, minf { stbl {
  * stsd { avc1 { avcC } }, stsz, stco } } } } } / mdat`.
  *
  * The walk reads it the way a demuxer does: big-endian box
  * size/type scan (unknown boxes SKIPPED, the spec's forward-compat
  * rule), container recursion, `avcC`'s parameter-set arrays parsed
  * through the SAME SPS/PPS decoders as the Annex-B walk, samples
  * sliced by their 4-byte length prefixes, and the CROSS-BOX
  * consistency contracts enforced loudly: `stsz` entries must equal
  * the sample lengths `mdat` actually frames, `stco`'s chunk offset
  * must land exactly on the first sample, and the THREE width/height
  * declarations (SPS macroblocks × 16, `avc1`'s 16-bit fields,
  * `tkhd`'s 16.16 fixed point) must agree — the box-layer analogue of
  * the slice→PPS→SPS reference graph.
  *
  * Subset (checked loudly): one video track, version-0 full boxes,
  * one stsd entry, one chunk, `lengthSizeMinusOne = 3`, no vmhd/dinf
  * (a real player wants them; the structural walk does not), no
  * fragmented-MP4 (`moof`) tier.
  */
object Mp4 {

  private def u32(v: Long): Array[Byte] = {
    require(v >= 0 && v <= 0xFFFFFFFFL, s"mp4: u32 $v")
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  }
  private def u16(v: Int): Array[Byte] = {
    require(v >= 0 && v <= 0xFFFF, s"mp4: u16 $v")
    Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  }
  private def fourcc(s: String): Array[Byte] = {
    require(s.length == 4, s"mp4: fourcc '$s'")
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  }
  private def box(tpe: String, payload: Array[Byte]*): Array[Byte] = {
    val len = 8L + payload.map(_.length.toLong).sum
    val out = new java.io.ByteArrayOutputStream(len.toInt)
    out.write(u32(len), 0, 4)
    out.write(fourcc(tpe), 0, 4)
    payload.foreach(p => out.write(p, 0, p.length))
    out.toByteArray
  }

  val Timescale = 90000L
  val TicksPerSample = 3003L // ~29.97 fps

  private val IdentityMatrix: Array[Byte] =
    u32(0x00010000L) ++ u32(0) ++ u32(0) ++
      u32(0) ++ u32(0x00010000L) ++ u32(0) ++
      u32(0) ++ u32(0) ++ u32(0x40000000L)

  /** Mux SPS/PPS/slice NAL units into the subset's box tree. `lieStsz`
    * bumps the first stsz entry by one and `lieStco` shifts the chunk
    * offset by one — the quarantine tier's cross-box lies (every box
    * still parses; the CONSISTENCY contracts must catch them).
    */
  def encodeMp4(sps: Codecs.H264Sps, spsNal: Array[Byte],
      ppsNal: Array[Byte], samples: Seq[Array[Byte]],
      lieStsz: Boolean = false, lieStco: Boolean = false): Array[Byte] = {
    require(samples.nonEmpty, "mp4: zero samples")
    val w = sps.widthMbs * 16
    val h = sps.heightMbs * 16
    val duration = samples.size * TicksPerSample

    val avcC = box("avcC",
      Array[Byte](1, sps.profileIdc.toByte, 0, sps.levelIdc.toByte,
        0xFF.toByte, // reserved ++ lengthSizeMinusOne = 3
        0xE1.toByte), // reserved ++ numOfSequenceParameterSets = 1
      u16(spsNal.length), spsNal,
      Array[Byte](1), // numOfPictureParameterSets
      u16(ppsNal.length), ppsNal)
    val avc1 = box("avc1",
      Array.fill[Byte](6)(0), u16(1), // reserved, data_reference_index
      Array.fill[Byte](16)(0), // pre_defined/reserved block
      u16(w), u16(h),
      u32(0x00480000L), u32(0x00480000L), // 72 dpi h/v resolution
      u32(0), u16(1), // reserved, frame_count
      Array.fill[Byte](32)(0), // compressorname
      u16(24), u16(0xFFFF), // depth, pre_defined = -1
      avcC)
    val stsd = box("stsd", u32(0), u32(1), avc1)
    val stsz = box("stsz", u32(0), u32(0), u32(samples.size.toLong),
      samples.zipWithIndex.map { case (s, i) =>
        u32(s.length.toLong + (if (lieStsz && i == 0) 1 else 0))
      }.reduce(_ ++ _))
    // stco's offset is the absolute file position of the first sample:
    // ftyp (24) + moov + mdat header (8) + the 4-byte length prefix is
    // part of the SAMPLE in this convention? NO — ISO 14496-15 samples
    // ARE the length-prefixed NAL stream, so the chunk starts at the
    // first length prefix, i.e. right after the mdat header.
    // moov's size depends on nothing below here, so compute it first.
    val mdatPayloadLen = samples.map(4L + _.length).sum
    def moovWith(stcoOffset: Long): Array[Byte] = {
      val stco = box("stco", u32(0), u32(1), u32(stcoOffset))
      val stbl = box("stbl", stsd, stsz, stco)
      val minf = box("minf", stbl)
      val hdlr = box("hdlr", u32(0), u32(0), fourcc("vide"),
        Array.fill[Byte](12)(0), Array[Byte](0))
      val mdhd = box("mdhd", u32(0), u32(0), u32(0), u32(Timescale),
        u32(duration), u16(0x55C4), u16(0)) // language 'und'
      val mdia = box("mdia", mdhd, hdlr, minf)
      val tkhd = box("tkhd", u32(0), u32(0), u32(0), u32(1), u32(0),
        u32(duration), u32(0) ++ u32(0), u16(0), u16(0), u16(0), u16(0),
        IdentityMatrix, u32(w.toLong << 16), u32(h.toLong << 16))
      val mvhd = box("mvhd", u32(0), u32(0), u32(0), u32(Timescale),
        u32(duration), u32(0x00010000L), u16(0x0100), u16(0),
        u32(0) ++ u32(0), IdentityMatrix, Array.fill[Byte](24)(0), u32(2))
      box("moov", mvhd, box("trak", tkhd, mdia))
    }
    // two-pass: moov's byte length is offset-independent (stco is a
    // fixed-width u32), so size it with a placeholder then re-emit
    val moovLen = moovWith(0L).length
    val stcoOffset = 24L + moovLen + 8L + (if (lieStco) 1 else 0)
    val moov = moovWith(stcoOffset)
    val ftyp = box("ftyp", fourcc("isom"), u32(512), fourcc("isom"),
      fourcc("avc1"))
    require(ftyp.length == 24, s"mp4: ftyp ${ftyp.length}")
    val mdat = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(u32(8L + mdatPayloadLen), 0, 4)
      out.write(fourcc("mdat"), 0, 4)
      samples.foreach { s =>
        out.write(u32(s.length.toLong), 0, 4)
        out.write(s, 0, s.length)
      }
      out.toByteArray
    }
    ftyp ++ moov ++ mdat
  }

  /** A walked MP4: box count (known boxes visited), skipped-unknown
    * count, the parsed SPS/PPS, sample NAL units in order, and the
    * header fields the census prices.
    */
  final case class Mp4Doc(nBoxes: Int, nSkipped: Int,
      sps: Codecs.H264Sps, pps: Codecs.H264Pps, spsNal: Array[Byte],
      ppsNal: Array[Byte], samples: Vector[Array[Byte]], timescale: Long,
      duration: Long, width: Int, height: Int, avccBytes: Int,
      moovBytes: Int, totalBytes: Int)

  def decodeMp4(bytes: Array[Byte]): Mp4Doc = {
    var nBoxes = 0
    var nSkipped = 0
    // every fixed-offset field read is bounds-checked: a truncated or
    // size-lying box must be a CONTRACT error, never an index leak
    // (Mp4Spec's hostile-input pin holds this)
    def need(p: Int, n: Int): Unit =
      require(p >= 0 && p + n <= bytes.length,
        s"mp4: $n-byte read at $p over-runs the ${bytes.length}-byte file")
    def be32(p: Int): Long = { need(p, 4)
      ((bytes(p) & 0xFFL) << 24) |
      ((bytes(p + 1) & 0xFFL) << 16) | ((bytes(p + 2) & 0xFFL) << 8) |
      (bytes(p + 3) & 0xFFL) }
    def be16(p: Int): Int = { need(p, 2)
      ((bytes(p) & 0xFF) << 8) | (bytes(p + 1) & 0xFF) }
    def byteAt(p: Int): Int = { need(p, 1); bytes(p) & 0xFF }
    def tpe(p: Int): String = { need(p + 4, 4)
      new String(bytes, p + 4, 4,
        java.nio.charset.StandardCharsets.US_ASCII) }
    // scan the children of [from, to): (type, payloadStart, payloadEnd)
    def children(from: Int, to: Int): Vector[(String, Int, Int)] = {
      val out = Vector.newBuilder[(String, Int, Int)]
      var p = from
      while (p < to) {
        require(p + 8 <= to, s"mp4: truncated box header at $p")
        val sz = be32(p)
        require(sz >= 8 && p + sz <= to,
          s"mp4: box '${tpe(p)}' size $sz over-runs its parent at $p")
        out += ((tpe(p), p + 8, p + sz.toInt))
        p += sz.toInt
      }
      out.result()
    }
    def one(cs: Vector[(String, Int, Int)], t: String): (Int, Int) = {
      val hits = cs.filter(_._1 == t)
      require(hits.size == 1,
        s"mp4: expected exactly one '$t', found ${hits.size}")
      nBoxes += 1
      (hits.head._2, hits.head._3)
    }
    val top = children(0, bytes.length)
    val (ftypS, ftypE) = one(top, "ftyp")
    require(ftypE - ftypS >= 8 && new String(bytes, ftypS, 4,
      java.nio.charset.StandardCharsets.US_ASCII) == "isom",
      "mp4: ftyp major brand is not isom")
    val (moovS, moovE) = one(top, "moov")
    val (mdatS, mdatE) = one(top, "mdat")
    nSkipped += top.count(c => c._1 != "ftyp" && c._1 != "moov" &&
      c._1 != "mdat")

    val moovKids = children(moovS, moovE)
    val (mvhdS, mvhdE) = one(moovKids, "mvhd")
    require(mvhdE - mvhdS == 100, s"mp4: mvhd payload ${mvhdE - mvhdS}")
    require(byteAt(mvhdS) == 0, "mp4: mvhd version != 0 unsupported")
    val timescale = be32(mvhdS + 12)
    val duration = be32(mvhdS + 16)
    val (trakS, trakE) = one(moovKids, "trak")
    nSkipped += moovKids.count(c => c._1 != "mvhd" && c._1 != "trak")

    val trakKids = children(trakS, trakE)
    val (tkhdS, tkhdE) = one(trakKids, "tkhd")
    require(tkhdE - tkhdS == 84, s"mp4: tkhd payload ${tkhdE - tkhdS}")
    require(byteAt(tkhdS) == 0, "mp4: tkhd version != 0 unsupported")
    val tkhdW = be32(tkhdS + 76)
    val tkhdH = be32(tkhdS + 80)
    require((tkhdW & 0xFFFF) == 0 && (tkhdH & 0xFFFF) == 0,
      "mp4: fractional tkhd dimensions")
    val (mdiaS, mdiaE) = one(trakKids, "mdia")

    val mdiaKids = children(mdiaS, mdiaE)
    val (mdhdS, mdhdE) = one(mdiaKids, "mdhd")
    require(mdhdE - mdhdS == 24, s"mp4: mdhd payload ${mdhdE - mdhdS}")
    require(be32(mdhdS + 12) == timescale && be32(mdhdS + 16) == duration,
      "mp4: mdhd timescale/duration disagree with mvhd")
    val (hdlrS, hdlrE) = one(mdiaKids, "hdlr")
    require(hdlrE - hdlrS >= 24, s"mp4: hdlr payload ${hdlrE - hdlrS}")
    require(tpe(hdlrS + 4) == "vide", // handler_type at +8 of payload
      "mp4: track handler is not 'vide'")
    val (minfS, minfE) = one(mdiaKids, "minf")
    val stblKids = children(minfS, minfE)
    val (stblS, stblE) = one(stblKids, "stbl")
    val kids = children(stblS, stblE)

    val (stsdS, stsdE) = one(kids, "stsd")
    require(be32(stsdS + 4) == 1, "mp4: stsd entry_count != 1")
    val entries = children(stsdS + 8, stsdE)
    require(entries.size == 1 && entries.head._1 == "avc1",
      s"mp4: stsd entry is not avc1")
    nBoxes += 1
    val (avc1S, avc1E) = (entries.head._2, entries.head._3)
    require(avc1E - avc1S >= 78 + 8,
      s"mp4: avc1 entry payload ${avc1E - avc1S}")
    val avc1W = be16(avc1S + 24)
    val avc1H = be16(avc1S + 26)
    val avcCs = children(avc1S + 78, avc1E)
    require(avcCs.size == 1 && avcCs.head._1 == "avcC",
      "mp4: avc1 sample entry without an avcC record")
    nBoxes += 1
    val (ccS, ccE) = (avcCs.head._2, avcCs.head._3)
    require(ccE - ccS >= 11, s"mp4: avcC payload ${ccE - ccS}")
    require(byteAt(ccS) == 1, "mp4: avcC configurationVersion != 1")
    require((byteAt(ccS + 4) & 0x03) == 3,
      "mp4: lengthSizeMinusOne != 3 unsupported")
    require((byteAt(ccS + 5) & 0x1F) == 1, "mp4: numSPS != 1 unsupported")
    val spsLen = be16(ccS + 6)
    require(spsLen >= 1 && ccS + 8 + spsLen + 3 <= ccE,
      s"mp4: SPS of $spsLen bytes over-runs avcC")
    val spsNal = java.util.Arrays.copyOfRange(bytes, ccS + 8,
      ccS + 8 + spsLen)
    var p = ccS + 8 + spsLen
    require(byteAt(p) == 1, "mp4: numPPS != 1 unsupported")
    val ppsLen = be16(p + 1)
    require(ppsLen >= 1 && p + 3 + ppsLen <= ccE,
      s"mp4: PPS of $ppsLen bytes over-runs avcC")
    val ppsNal = java.util.Arrays.copyOfRange(bytes, p + 3,
      p + 3 + ppsLen)
    require(p + 3 + ppsLen == ccE, "mp4: trailing bytes inside avcC")
    // the parameter sets are REAL NAL units — parse them with the same
    // decoders the Annex-B walk uses (header byte, unescape, Exp-Golomb)
    require(spsNal.nonEmpty && (spsNal(0) & 0xFF) == 0x67,
      "mp4: avcC SPS array entry is not an SPS NAL")
    require(ppsNal.nonEmpty && (ppsNal(0) & 0xFF) == 0x68,
      "mp4: avcC PPS array entry is not a PPS NAL")
    val sps = Codecs.parseSpsRbsp(Codecs.unescapeRbsp(spsNal.drop(1)))
    val pps = Codecs.parsePpsRbsp(Codecs.unescapeRbsp(ppsNal.drop(1)))
    require(byteAt(ccS + 1) == sps.profileIdc &&
      byteAt(ccS + 3) == sps.levelIdc,
      "mp4: avcC profile/level disagree with the SPS inside it")

    val (stszS, stszE) = one(kids, "stsz")
    require(be32(stszS + 4) == 0, "mp4: fixed-size stsz unsupported")
    val n = be32(stszS + 8).toInt
    require(n >= 1, "mp4: zero samples")
    require(stszE - stszS == 12 + 4L * n,
      s"mp4: stsz payload ${stszE - stszS} != 12 + 4*$n")
    val sizes = (0 until n).map(i => be32(stszS + 12 + 4 * i))
    val (stcoS, stcoE) = one(kids, "stco")
    require(stcoE - stcoS == 12, s"mp4: stco payload ${stcoE - stcoS}")
    require(be32(stcoS + 4) == 1, "mp4: multi-chunk stco unsupported")
    val chunkOff = be32(stcoS + 8)

    // the cross-box contracts: stco lands on the first sample, every
    // stsz entry equals the length mdat actually frames, the samples
    // exactly fill mdat
    require(chunkOff == mdatS,
      s"mp4: stco chunk offset $chunkOff does not land on the mdat " +
        s"payload at $mdatS")
    var sp = mdatS
    val samples = sizes.zipWithIndex.map { case (sz, i) =>
      require(sp + 4 <= mdatE, s"mp4: sample $i length prefix over-runs mdat")
      val len = be32(sp)
      require(len == sz,
        s"mp4: stsz declares $sz bytes for sample $i, mdat frames $len")
      require(sp + 4 + len <= mdatE, s"mp4: sample $i over-runs mdat")
      val s = java.util.Arrays.copyOfRange(bytes, sp + 4, sp + 4 + len.toInt)
      sp += 4 + len.toInt
      s
    }
    require(sp == mdatE, s"mp4: ${mdatE - sp} unclaimed bytes in mdat")

    // the three width/height declarations must agree
    val w = sps.widthMbs * 16; val h = sps.heightMbs * 16
    require(avc1W == w && avc1H == h,
      s"mp4: avc1 ${avc1W}x$avc1H disagrees with SPS ${w}x$h")
    require(tkhdW == (w.toLong << 16) && tkhdH == (h.toLong << 16),
      s"mp4: tkhd dimensions disagree with SPS ${w}x$h")
    require(duration == n * TicksPerSample,
      s"mp4: duration $duration != $n samples x $TicksPerSample")

    Mp4Doc(nBoxes, nSkipped, sps, pps, spsNal, ppsNal, samples.toVector,
      timescale, duration, w, h, ccE - ccS + 8, moovE - moovS + 8,
      bytes.length)
  }

  /** The container-to-codec BRIDGE: reconstruct the Annex-B stream from
    * avcC's parameter sets + the length-prefixed samples (4-byte start
    * code on the SPS, 3-byte on the rest — [[Codecs
    * .encodeH264StreamMultiPps]]'s framing, so the reconstruction is
    * byte-identical to what the Annex-B tier would have written for
    * the same NAL units) and hand it to the EXISTING walk.
    */
  def toAnnexB(d: Mp4Doc): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    (Vector(d.spsNal, d.ppsNal) ++ d.samples).zipWithIndex.foreach {
      case (u, i) =>
        if (i == 0) out.write(0)
        out.write(0); out.write(0); out.write(1)
        out.write(u, 0, u.length)
    }
    out.toByteArray
  }

  // ------------------------------------------------------ Spark tiers

  /** Genuine MP4s synthesized from the corpus: the SAME SPS and slice
    * recurrence as the Annex-B tier (q204's arithmetic), muxed into the
    * box tree. `breakRefs` plants the cross-box lies (id % 13: stsz;
    * else id % 11: stco).
    */
  private[multimodal] def mp4BytesFor(id: Long, t: String,
      breakRefs: Boolean): Array[Byte] = {
    val codes = Multimodal.asciiBytes(t)
    val slices = Multimodal.h264FrameParams(id, codes)
      .map { case (r, ty, pl, _) => (r, ty, pl, 0) }
    val sps = Multimodal.h264SpsFor(id)
    val units = Codecs.h264NalUnitsMultiPps(sps,
      Seq(Codecs.DefaultPps), slices)
    encodeMp4(sps, units(0), units(1), units.drop(2),
      lieStsz = breakRefs && id % 13 == 0,
      lieStco = breakRefs && id % 13 != 0 && id % 11 == 0)
  }

  def mp4FromText(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, breakRefs: Boolean = false): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("media_id"),
        coalesce(col(textCol), lit("")).as("t"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        MediaRow(id, "video/mp4", mp4BytesFor(id, t, breakRefs))
      })
  }

  case class Mp4Census(media_id: Long, n_boxes: Long, n_samples: Long,
      stsz_sum: Long, mdat_bytes: Long, timescale: Long, duration: Long,
      width_px: Long, height_px: Long, avcc_bytes: Long, moov_bytes: Long,
      total_bytes: Long)

  def mp4Census(media: Dataset[MediaRow]): Dataset[Mp4Census] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val d = decodeMp4(r.content)
      Mp4Census(r.media_id, d.nBoxes.toLong, d.samples.size.toLong,
        d.samples.map(_.length.toLong).sum,
        d.samples.map(4L + _.length).sum,
        d.timescale, d.duration, d.width.toLong, d.height.toLong,
        d.avccBytes.toLong, d.moovBytes.toLong, d.totalBytes.toLong)
    })
  }

  case class TriedMp4Census(media_id: Long, decode_ok: Long,
      n_boxes: Long, n_samples: Long, stsz_sum: Long, mdat_bytes: Long,
      timescale: Long, duration: Long, width_px: Long, height_px: Long,
      avcc_bytes: Long, moov_bytes: Long, total_bytes: Long)

  def tryMp4Census(media: Dataset[MediaRow]): Dataset[TriedMp4Census] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      try {
        val d = decodeMp4(r.content)
        TriedMp4Census(r.media_id, 1L, d.nBoxes.toLong,
          d.samples.size.toLong, d.samples.map(_.length.toLong).sum,
          d.samples.map(4L + _.length).sum, d.timescale, d.duration,
          d.width.toLong, d.height.toLong, d.avccBytes.toLong,
          d.moovBytes.toLong, d.totalBytes.toLong)
      } catch {
        case scala.util.control.NonFatal(_) =>
          TriedMp4Census(r.media_id, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
            0L, 0L, 0L)
      }
    })
  }

  /** The bridge tier: demux → reconstruct Annex-B → the EXISTING
    * H.264 NAL walk — the same census relation q204 computes over the
    * directly-written Annex-B stream, now arriving through the
    * container (oracle: q204's SQL verbatim).
    */
  def mp4BridgeCensus(media: Dataset[MediaRow]):
      Dataset[Multimodal.H264Census] = {
    import media.sparkSession.implicits._
    Multimodal.h264NalCensus(media.mapPartitions(_.map { r =>
      MediaRow(r.media_id, "video/h264", toAnnexB(decodeMp4(r.content)))
    }))
  }
}
