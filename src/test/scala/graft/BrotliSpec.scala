package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.web.Brotli

/** RFC 7932 decoder conformance, pinned against the REFERENCE C brotli
  * library two ways: (1) streams the reference encoder emitted
  * (qualities 1-11, window sizes 10-22, generic and text modes, UTF-8
  * payloads, static-dictionary-heavy text) must decode byte-exactly;
  * (2) hand-assembled single-command streams that reference a chosen
  * static-dictionary word under a chosen transform id — each VERIFIED
  * against the reference decoder when the golden was minted — must
  * reproduce the reference decoder's output byte-exactly, pinning the
  * Appendix A dictionary slicing and every Appendix B transform class
  * (identity, affix joins, OmitFirst/OmitLast, UppercaseFirst/All with
  * the UTF-8 ferment, the NBSP prefix). Plus the synthesis encoder's
  * exact size arithmetic and the loud-failure corruption contract the
  * quarantine tier relies on.
  */
class BrotliSpec extends AnyFunSuite {

  private def unhex(s: String): Array[Byte] = {
    val t = s.replaceAll("\\s", "")
    Array.tabulate(t.length / 2)(i =>
      Integer.parseInt(t.substring(2 * i, 2 * i + 2), 16).toByte)
  }

  test("reference-encoder golden 'empty': the 1-byte empty stream") {
    val stream = unhex("3b")
    val expect = Array.emptyByteArray
    assert(java.util.Arrays.equals(Brotli.decode(stream), expect))
  }

  test("reference-encoder golden 'one': a single literal") {
    val stream = unhex("0b00807803")
    val expect = unhex("78")
    assert(java.util.Arrays.equals(Brotli.decode(stream), expect))
  }

  test("reference-encoder golden 'dict_small': function-word text at q11 (static-dictionary heavy)") {
    val stream = unhex("0b0c80746865206f6620616e64206120696e20746f2069732077617303")
    val expect = unhex("746865206f6620616e64206120696e20746f20697320776173")
    assert(java.util.Arrays.equals(Brotli.decode(stream), expect))
  }

  test("reference-encoder golden 'eng_q11': an English paragraph at q11 (context modeling + dictionary)") {
    val stream = unhex("1bc700a0046a6ea95e48b444286c0006b70f16554f16723f9f4d50755270" +
      "6e63eb991265275c5f059c39a2695d28f401e0ecf88fd4c443c8b052ad4e" +
      "5cf9fc279f6bca2854e563c7691429592f5e62d1a0bccca0016c1128a501")
    val expect = unhex("54686520717569636b2062726f776e20666f78206a756d7073206f766572" +
      "20746865206c617a7920646f672e20546869732069732061207465737420" +
      "6f662074686520656d657267656e63792062726f616463617374696e6720" +
      "73797374656d2c20616e6420616c6c206f66207468652070656f706c6520" +
      "77686f20776f726b207769746820696e666f726d6174696f6e2066726f6d" +
      "20746865207075626c696320646f6d61696e2077696c6c2062652061626c" +
      "6520746f2072656164207468697320746578742e")
    assert(java.util.Arrays.equals(Brotli.decode(stream), expect))
  }

  test("reference-encoder golden 'eng_q5': the same paragraph at q5") {
    val stream = unhex("1bc7000004c2b6a5fa21d112a1cc63a28acc8329e8a70bb99b4d31421390" +
      "7499e8a1b783dbf039c329d15b45dc14cdbf2ccd4665b5c9f15c77c75e6d" +
      "3f30ce22ff47b21c9aa40baedd996794bdc29a7bcd88acbb534d4aa9d8f1" +
      "d7b07662e7c2a3648cc40ca7d0a560f165b9af4bc2a1ca757a00")
    val expect = unhex("54686520717569636b2062726f776e20666f78206a756d7073206f766572" +
      "20746865206c617a7920646f672e20546869732069732061207465737420" +
      "6f662074686520656d657267656e63792062726f616463617374696e6720" +
      "73797374656d2c20616e6420616c6c206f66207468652070656f706c6520" +
      "77686f20776f726b207769746820696e666f726d6174696f6e2066726f6d" +
      "20746865207075626c696320646f6d61696e2077696c6c2062652061626c" +
      "6520746f2072656164207468697320746578742e")
    assert(java.util.Arrays.equals(Brotli.decode(stream), expect))
  }

  test("reference-encoder golden 'eng_q1': the same paragraph at q1 (fast-mode stream shape)") {
    val stream = unhex("8b63000080aaaaaaeaff7465b83bd8ede4878ba8aaa8a9b889aa98ab88b9" +
      "9ab9079c101fd2a5983429c1c6986788b57e37c6f7927c204d5b03d56e7c" +
      "ae7e3aecc713d1184aff07c5f60def260e7110823d60150d923bcf9d477e" +
      "6ed053c9e42163873f1edc5fa05140aa0bbe9e6ca73256332c9b07964483" +
      "8c6ab353880dd4691dd118e79554328a75928125aa480c4aca08c3642a88" +
      "268ee03bb601")
    val expect = unhex("54686520717569636b2062726f776e20666f78206a756d7073206f766572" +
      "20746865206c617a7920646f672e20546869732069732061207465737420" +
      "6f662074686520656d657267656e63792062726f616463617374696e6720" +
      "73797374656d2c20616e6420616c6c206f66207468652070656f706c6520" +
      "77686f20776f726b207769746820696e666f726d6174696f6e2066726f6d" +
      "20746865207075626c696320646f6d61696e2077696c6c2062652061626c" +
      "6520746f2072656164207468697320746578742e")
    assert(java.util.Arrays.equals(Brotli.decode(stream), expect))
  }

  test("reference-encoder golden 'rle': 40 x 'a' at q5 (distance-1 run copies)") {
    val stream = unhex("1b27000024c2c2994002")
    val expect = unhex("616161616161616161616161616161616161616161616161616161616161" +
      "61616161616161616161")
    assert(java.util.Arrays.equals(Brotli.decode(stream), expect))
  }

  test("reference-encoder golden 'rand64': 64 random bytes at q11 (incompressible path)") {
    val stream = unhex("8b1f80a54dca182530bb1d6d132cded6237b2ed91e3f721fcb1971174494" +
      "d6493c9d5c3460be31201e69fedaa0eee8b9997f5c7c2999fdafe593253c" +
      "d654af4dfad71403")
    val expect = unhex("a54dca182530bb1d6d132cded6237b2ed91e3f721fcb1971174494d6493c" +
      "9d5c3460be31201e69fedaa0eee8b9997f5c7c2999fdafe593253cd654af" +
      "4dfad714")
    assert(java.util.Arrays.equals(Brotli.decode(stream), expect))
  }

  test("reference-encoder golden 'utf8_q11': UTF-8 text at q11 (UTF8 context mode)") {
    val stream = unhex("0b208046c3bcc39f65206772c3b6c39f657220e2809420ce91ce92ce93ce" +
      "9420ceb1ceb2ceb3ceb420e697a5e69cace8aa9ee381aee38386e382ade3" +
      "82b9e38388e3808203")
    val expect = unhex("46c3bcc39f65206772c3b6c39f657220e2809420ce91ce92ce93ce9420ce" +
      "b1ceb2ceb3ceb420e697a5e69cace8aa9ee381aee38386e382ade382b9e3" +
      "8388e38082")
    assert(java.util.Arrays.equals(Brotli.decode(stream), expect))
  }

  test("reference-encoder golden 'caps': capitalized text at q11 (uppercase transform pressure)") {
    val stream = unhex("1b3d00e81da73b7ab3155ea940a83228e9295dcce6c021072ea7cf038b20" +
      "d23a402648ca3c469bb9c8f1a6d016")
    val expect = unhex("54686520496e7465726e65742049732041204e6574776f726b204f66204e" +
      "6574776f726b732e2054686520496e7465726e657420497320476c6f6261" +
      "6c2e")
    assert(java.util.Arrays.equals(Brotli.decode(stream), expect))
  }

  test("reference-encoder golden 'win10': q9 with a 10-bit window (smallest WBITS form)") {
    val stream = unhex("a13806002010b62dd50f899608651e1355641e4c413f5dc8dd6c8a119a80" +
      "a4cb440fbd1ddc86cf194e89de2ae2a668fe6569362aab4d8ee7ba3bf66a" +
      "fb817116f93f92e5d0245d70edce3ca3ec15d6dc6b4664dd9d6a524ac58e" +
      "bf86b5133b171e2563246638852e058b2fcb7d5d120e55aed303")
    val expect = unhex("54686520717569636b2062726f776e20666f78206a756d7073206f766572" +
      "20746865206c617a7920646f672e20546869732069732061207465737420" +
      "6f662074686520656d657267656e63792062726f616463617374696e6720" +
      "73797374656d2c20616e6420616c6c206f66207468652070656f706c6520" +
      "77686f20776f726b207769746820696e666f726d6174696f6e2066726f6d" +
      "20746865207075626c696320646f6d61696e2077696c6c2062652061626c" +
      "6520746f2072656164207468697320746578742e")
    assert(java.util.Arrays.equals(Brotli.decode(stream), expect))
  }

  test("reference-encoder golden 'text_mode': q11 MODE_TEXT (encoder mode variant)") {
    val stream = unhex("1bc700a0046a6ea95e48b444286c0006b70f16554f16723f9f4d50755270" +
      "6e63eb991265275c5f059c39a2695d28f401e0ecf88fd4c443c8b052ad4e" +
      "5cf9fc279f6bca2854e563c7691429592f5e62d1a0bccca0016c1128a501")
    val expect = unhex("54686520717569636b2062726f776e20666f78206a756d7073206f766572" +
      "20746865206c617a7920646f672e20546869732069732061207465737420" +
      "6f662074686520656d657267656e63792062726f616463617374696e6720" +
      "73797374656d2c20616e6420616c6c206f66207468652070656f706c6520" +
      "77686f20776f726b207769746820696e666f726d6174696f6e2066726f6d" +
      "20746865207075626c696320646f6d61696e2077696c6c2062652061626c" +
      "6520746f2072656164207468697320746578742e")
    assert(java.util.Arrays.equals(Brotli.decode(stream), expect))
  }

  test("dictionary-transform probes: hand-assembled one-command " +
      "streams (insert 0, copy = word length, long-form distance into " +
      "the dictionary range), each minted against the reference " +
      "decoder, reproduce its output for 17 transform ids spanning " +
      "every Appendix B operation class") {
    val probes: Seq[(String, String, Int)] = Seq(
      ("a20000000440101252", "6d6173746572", 0),
      ("c200000004401012e202", "616374696f6e20", 1),
      ("e200000004401012e40300", "2075706461746520", 2),
      ("a200000004401412e50100", "696d73656c66", 3),
      ("a200000004401012a80102", "436f6d6d6f6e", 9),
      ("c200000004401012a60100", "436f6d6d6f6e20", 4),
      ("2201000004400c12660302", "736d616c6c20616e6420", 10),
      ("6200000004401012280206", "656e7473", 11),
      ("8200000004401012290200", "6576656e74", 12),
      ("8200000004401812680107", "627573696e", 23),
      ("a2000000044010122c0618", "43484f4f5345", 44),
      ("6201000004401c122b1a01", "6f74686572776973696e6720", 49),
      ("c2000000044010126e0908", "495453454c4620", 68),
      ("2201000004400c12ac0d08", "2e636f6d2f626c6f636b", 72),
      ("a2000000044008126d1406", "c2a07369676e", 102),
      ("c2000000044010122f0322", "42414e4e455228", 113),
      ("22010000044014122f1030", "204c696d697465643d27", 120),
    )
    probes.foreach { case (stream, expect, tid) =>
      val (got, stats) = Brotli.decodeWithStats(unhex(stream))
      assert(java.util.Arrays.equals(got, unhex(expect)),
        s"transform $tid mismatch")
      assert(stats.nDictRefs === 1L, s"transform $tid: expected a dict ref")
    }
  }

  // ------------------------------------------------------- encoder side

  test("encodeUncompressed: exact size arithmetic (1 byte empty, else " +
      "3 * ceil(n/65535) + n + 1) and byte-exact round-trip through the " +
      "decoder across the chunk boundary") {
    assert(Brotli.encodeUncompressed(Array.emptyByteArray).length === 1)
    val rng = new scala.util.Random(11)
    for (n <- Seq(1, 10, 100, 65534, 65535, 65536, 131071, 200000)) {
      val p = new Array[Byte](n)
      rng.nextBytes(p)
      val e = Brotli.encodeUncompressed(p)
      assert(e.length === 3 * ((n + 65534) / 65535) + n + 1, s"n=$n")
      assert(java.util.Arrays.equals(Brotli.decode(e), p), s"n=$n")
    }
  }

  test("encodeUncompressed golden: the framing bytes are the exact wire " +
      "form the reference decoder accepts (verified when minted)") {
    // 'hello brotli wire' framed as one uncompressed metablock:
    // 0 (WBITS=16) 0 (ISLAST) 00 (4 nibbles) 0x0010 (MLEN-1, LSB
    // first) 1 (ISUNCOMPRESSED) pad -> 21 bits -> "000110", payload,
    // 0x03 close (ISLAST + ISLASTEMPTY)
    val got = Brotli.encodeUncompressed(
      "hello brotli wire".getBytes("US-ASCII"))
    assert(got.map("%02x".format(_)).mkString ===
      "00011068656c6c6f2062726f746c69207769726503")
  }

  // -------------------------------------------------- loud-failure tier

  test("corruption is loud: a flipped bit in any stream region throws " +
      "rather than mis-decoding silently or looping") {
    val stream = unhex("1bc700a0046a6ea95e48b444286c0006b70f16554f16723f" +
      "9f4d507552706e63eb991265275c5f059c39a2695d28f401e0ecf88fd4c443c8" +
      "b052ad4e5cf9fc279f6bca2854e563c7691429592f5e62d1a0bccca0016c1128" +
      "a501")
    val expect = Brotli.decode(stream)
    var loud = 0
    var silentWrong = 0
    for (i <- stream.indices; bit <- 0 until 8) {
      val bad = stream.clone()
      bad(i) = (bad(i) ^ (1 << bit)).toByte
      try {
        val got = Brotli.decode(bad)
        if (!java.util.Arrays.equals(got, expect)) silentWrong += 1
      } catch {
        case _: IllegalArgumentException => loud += 1
        case _: ArrayIndexOutOfBoundsException =>
          fail(s"raw index error (not the loud contract) at byte $i bit $bit")
      }
    }
    // most flips must be caught; NONE may crash with a raw index error.
    // (Some flips land in literal payload bits and legitimately change
    // the output — entropy-coded data cannot detect every single-bit
    // change without a checksum, which RFC 7932 does not carry.)
    assert(loud > silentWrong)
  }

  test("truncation is loud at every cut point") {
    val stream = unhex("1bc700a0046a6ea95e48b444286c0006b70f16554f16723f" +
      "9f4d507552706e63eb991265275c5f059c39a2695d28f401e0ecf88fd4c443c8" +
      "b052ad4e5cf9fc279f6bca2854e563c7691429592f5e62d1a0bccca0016c1128" +
      "a501")
    for (cut <- 1 until stream.length) {
      intercept[IllegalArgumentException] {
        Brotli.decode(java.util.Arrays.copyOf(stream, cut))
      }
    }
  }

  test("decodeWithStats: the q11 paragraph reports dictionary refs and " +
      "copies, and the Stats integers reconcile with the output") {
    val stream = unhex("1bc700a0046a6ea95e48b444286c0006b70f16554f16723f" +
      "9f4d507552706e63eb991265275c5f059c39a2695d28f401e0ecf88fd4c443c8" +
      "b052ad4e5cf9fc279f6bca2854e563c7691429592f5e62d1a0bccca0016c1128" +
      "a501")
    val (out, s) = Brotli.decodeWithStats(stream)
    assert(s.outBytes === out.length.toLong)
    assert(s.outBytes === 200L)
    assert(s.nLiterals + s.nCopyBytes + s.nDictBytes === s.outBytes)
    assert(s.nDictRefs > 0L, "q11 English text must hit the dictionary")
    assert(s.sumOut === out.iterator.map(b => (b & 0xFF).toLong).sum)
    assert(s.streamBytes === stream.length.toLong)
  }

  test("the large-window extension (reserved WBITS pattern) is rejected " +
      "by name, not mis-parsed") {
    // '1' then '000' then '001' — the RFC 7932 reserved pattern
    val b = Array[Byte]((1 | (0 << 1) | (1 << 4)).toByte, 0x00)
    val e = intercept[IllegalArgumentException](Brotli.decode(b))
    assert(e.getMessage.contains("large-window"))
  }

  test("encodeCompressed: the entropy-coded metablock round-trips " +
      "byte-exactly at both insert-code regimes and its size is the " +
      "exact 98 + E(n) + 8n bit arithmetic") {
    val rnd = new scala.util.Random(19)
    for (n <- Seq(1, 5, 6, 9, 13, 100, 129, 1089, 2113, 6209, 6210,
        22594, 65536)) {
      val payload = new Array[Byte](n)
      rnd.nextBytes(payload)
      val c = Brotli.encodeCompressed(payload)
      val (back, stats) = Brotli.decodeWithStats(c)
      assert(java.util.Arrays.equals(back, payload), s"n=$n")
      assert(stats.nMetablocks === 1L && stats.nUncompressed === 0L)
      assert(stats.nLiterals === n.toLong, s"n=$n literal count")
      // E(n) from the section-5 insert-code table
      val bases = Seq(0, 1, 2, 3, 4, 5, 6, 8, 10, 14, 18, 26, 34, 50, 66,
        98, 130, 194, 322, 578, 1090, 2114, 6210, 22594)
      val extras = Seq(0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6,
        7, 8, 9, 10, 12, 14, 24)
      val e = extras(bases.lastIndexWhere(_ <= n))
      assert(c.length === (98 + e + 8 * n + 7) / 8, s"n=$n size")
    }
  }

  test("encodeCompressed golden: the exact wire bytes for a fixed " +
      "payload (verified against the reference decoder when minted)") {
    val got = Brotli.encodeCompressed("entropy wire".getBytes("US-ASCII"))
    // minted 2026-08-16; brotli (C library) decompresses this stream
    // back to the payload byte-exactly
    assert(got.map("%02x".format(_)).mkString === "620100000000000700044001686ae7e264efe049e06ee9640a")
  }
}
