package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Pdf

class PdfSpec extends AnyFunSuite {

  private def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  test("PDF round-trip: encode/walk recovers objects, MediaBox, stream " +
      "sizes, and the text through BOTH filters; escapes are exact") {
    val text = ascii("""a (parenthesized) line with a \ backslash""")
    for (flate <- Seq(true, false)) {
      val bytes = Pdf.encodePdf(text, 500, 640, flate)
      val d = Pdf.decodePdf(bytes)
      assert(d.objects.size === 4)
      assert(d.objects.map(_.objType) ===
        Vector("Catalog", "Pages", "Page", ""))
      assert(d.pageW === 500 && d.pageH === 640)
      assert(d.totalBytes === bytes.length)
      val st = d.objects.find(_.streamWire >= 0).get
      assert(st.flate === flate)
      // content = 14-byte text op prefix + escaped text + 7-byte suffix;
      // this text carries 3 escapable chars
      assert(st.streamDecoded === 14 + text.length + 3 + 7)
      assert(java.util.Arrays.equals(Pdf.extractText(d), text))
      // the xref offset in the walked doc is where the table really is
      assert(new String(bytes, d.xrefOffset, 5,
        java.nio.charset.StandardCharsets.US_ASCII) === "xref\n")
    }
    // empty text is a legal one-op page
    val empty = Pdf.decodePdf(Pdf.encodePdf(Array.emptyByteArray, 400, 500,
      flate = true))
    assert(Pdf.extractText(empty).length === 0)
  }

  test("PDF structural lies are caught at the exact contract: a lying " +
      "xref entry at the object header, a short /Length at the " +
      "endstream landing — never a silent re-sync") {
    val text = ascii("structural damage, not bit damage")
    val lied = Pdf.encodePdf(text, 400, 500, flate = true, lieXref = true)
    val e1 = intercept[IllegalArgumentException](Pdf.decodePdf(lied))
    assert(e1.getMessage.contains("does not open"))
    val short = Pdf.encodePdf(text, 400, 500, flate = false,
      lieLength = true)
    val e2 = intercept[IllegalArgumentException](Pdf.decodePdf(short))
    assert(e2.getMessage.contains("endstream"))
    // a corrupt zlib container inside an otherwise-pristine structure
    // is caught by the inflate layer (Adler-32)
    val good = Pdf.encodePdf(text, 400, 500, flate = true)
    val d = Pdf.decodePdf(good)
    val streamStart = new String(good,
      java.nio.charset.StandardCharsets.US_ASCII).indexOf("stream\n") + 7
    val bad = good.clone()
    // flip a byte INSIDE the zlib data (past the 2-byte header)
    bad(streamStart + 4) = (bad(streamStart + 4) ^ 0x40).toByte
    intercept[IllegalArgumentException](Pdf.decodePdf(bad))
    assert(d.content.length > 0) // the pristine walk still stands
  }

  test("PDF hostile-input pin: seeded byte mutations of a valid file " +
      "and raw random bytes either parse or raise the contract error " +
      "class — no index/regex/arithmetic leak for the quarantine tier " +
      "to mask") {
    val good = Pdf.encodePdf(ascii("the file under mutation test"), 450,
      570, flate = true)
    val rnd = new scala.util.Random(0x9DF15EED)
    var parsed = 0; var refused = 0
    (0 until 400).foreach { _ =>
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      try { Pdf.decodePdf(b); parsed += 1 }
      catch {
        case _: IllegalArgumentException => refused += 1
        case _: NumberFormatException =>
          // a mutated digit run can overflow Int in toInt — that is a
          // refusal too, but assert it stays in the numeric parse, not
          // an array index or regex stack leak
          refused += 1
      }
    }
    assert(parsed + refused === 400)
    assert(refused > 0, "no mutation was ever refused — the checks are dead")
    (0 until 100).foreach { _ =>
      val junk = Array.fill(64 + rnd.nextInt(256))(rnd.nextInt(256).toByte)
      intercept[Exception](Pdf.decodePdf(junk)) match {
        case _: IllegalArgumentException | _: NumberFormatException => ()
        case other => fail(s"junk leaked ${other.getClass}: $other")
      }
    }
  }

  // ------------------------------------------ §7.5.6 / §7.5.7 (r16)

  test("incremental update (§7.5.6): the update's object 4 WINS over " +
      "the stale base — text, section count, and totals reconcile") {
    val text = "updated body, with (escapes) and \\ slashes".getBytes("US-ASCII")
    for (flate <- Seq(false, true)) {
      val b = Pdf.encodePdfIncremental(text, 420, 570, flate)
      val d = Pdf.decodePdf(b)
      assert(d.nSections === 2 && !d.xrefStream && d.nInObjStm === 0)
      assert(d.objects.size === 4)
      assert(d.pageW === 420 && d.pageH === 570)
      assert(java.util.Arrays.equals(Pdf.extractText(d), text))
      assert(d.totalBytes === b.length)
      // the stale base text must NOT be what extraction returns
      assert(!new String(Pdf.extractText(d), "US-ASCII").contains("stale"))
    }
  }

  test("object streams (§7.5.7) via a cross-reference stream (§7.5.8): " +
      "catalog/pages/page resolve from inside the FlateDecoded carrier") {
    val text = "object-stream body".getBytes("US-ASCII")
    for (flate <- Seq(false, true)) {
      val b = Pdf.encodePdfObjStm(text, 450, 640, flate)
      val d = Pdf.decodePdf(b)
      assert(d.nSections === 1 && d.xrefStream && d.nInObjStm === 3)
      assert(d.objects.size === 6) // 3 members + content + ObjStm + XRef
      assert(d.objects.count(_.objType == "Catalog") === 1)
      assert(d.pageW === 450 && d.pageH === 640)
      assert(java.util.Arrays.equals(Pdf.extractText(d), text))
    }
  }

  test("the new lie classes are caught at their exact contracts: a " +
      "lying update-section entry, a short update /Length, a lying " +
      "binary xref row, an over-declared /First") {
    val text = "x".getBytes("US-ASCII")
    val e1 = intercept[IllegalArgumentException](Pdf.decodePdf(
      Pdf.encodePdfIncremental(text, 400, 500, flate = false, lieXref = true)))
    assert(e1.getMessage.contains("does not open"))
    val e2 = intercept[IllegalArgumentException](Pdf.decodePdf(
      Pdf.encodePdfIncremental(text, 400, 500, flate = true, lieLength = true)))
    assert(e2.getMessage.contains("endstream") ||
      e2.getMessage.contains("zlib"))
    val e3 = intercept[IllegalArgumentException](Pdf.decodePdf(
      Pdf.encodePdfObjStm(text, 400, 500, flate = false, lieXref = true)))
    assert(e3.getMessage.contains("does not open"))
    val e4 = intercept[IllegalArgumentException](Pdf.decodePdf(
      Pdf.encodePdfObjStm(text, 400, 500, flate = false, lieObjStm = true)))
    assert(e4.getMessage.contains("pair table"))
  }

  test("hostile-input pin extended to the 1.5 machinery: seeded byte " +
      "mutations of an objstm/xref-stream file never escape the loud " +
      "contract") {
    val base = Pdf.encodePdfObjStm(
      "mutation target".getBytes("US-ASCII"), 400, 500, flate = true)
    val rnd = new scala.util.Random(7)
    var refused = 0
    (0 until 300).foreach { _ =>
      val m = base.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      try { Pdf.decodePdf(m); () } catch {
        case _: IllegalArgumentException | _: NumberFormatException =>
          refused += 1
        case other: Throwable =>
          fail(s"mutation leaked ${other.getClass}: $other")
      }
    }
    assert(refused > 0)
  }
}
