package graft.canon

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Pins the encoder-scratch digest path (`Rdfc10.updateDigest`) to the
  * exact bytes of `String.getBytes(UTF_8)` — the invariant the round-5
  * allocation cut rests on. The W3C suite exercises realistic quads
  * only; the risky edges live here: strings larger than the 8 KB
  * scratch buffer (multi-chunk overflow loop), lone surrogates (must
  * encode as '?' exactly like getBytes), and chunk boundaries that
  * split a surrogate pair mid-encode.
  */
class EncodeScratchSpec extends AnyFunSuite {

  private def viaScratch(s: String): String = {
    val md = MessageDigest.getInstance("SHA-256")
    Rdfc10.updateDigest(md, s)
    md.digest().map(b => f"$b%02x").mkString
  }

  private def viaGetBytes(s: String): String = {
    val md = MessageDigest.getInstance("SHA-256")
    md.digest(s.getBytes(UTF_8)).map(b => f"$b%02x").mkString
  }

  test("empty and ASCII strings") {
    for (s <- Seq("", "a", "hello world", "x" * 8191, "x" * 8192, "x" * 8193))
      assert(viaScratch(s) == viaGetBytes(s), s"len=${s.length}")
  }

  test("multi-chunk: 3-byte CJK chars straddling the 8 KB buffer") {
    // 0x4E2D encodes to 3 bytes; 2731*3 = 8193 forces the overflow loop
    for (n <- Seq(2730, 2731, 2732, 10000))
      assert(viaScratch("中" * n) == viaGetBytes("中" * n), s"n=$n")
  }

  test("astral pairs straddling the buffer boundary") {
    // U+1F600 = surrogate pair, 4 UTF-8 bytes; 2048*4 = 8192 exactly,
    // and odd counts land a pair across the chunk edge
    val emoji = new String(Character.toChars(0x1F600))
    for (n <- Seq(2047, 2048, 2049, 4000))
      assert(viaScratch(emoji * n) == viaGetBytes(emoji * n), s"n=$n")
  }

  test("lone surrogates encode as '?' identically to getBytes") {
    val cases = Seq(
      "\ud800",            // lone high at end
      "\udc00",            // lone low at start
      "a\ud800b",          // lone high mid-string
      "a\udc00\ud800b",    // reversed pair
      "\ud800" * 5000,     // lone highs past the buffer boundary
      ("x" * 8191) + "\ud800", // lone surrogate at the chunk edge
      ("x" * 8191) + "𐀀" // valid pair split by the chunk edge
    )
    for (s <- cases)
      assert(viaScratch(s) == viaGetBytes(s),
        s.take(20).map(c => "\\u%04x".format(c.toInt)).mkString)
  }

  test("property: arbitrary unicode strings digest identically") {
    val unicodeChar = Gen.frequency(
      8 -> Gen.choose(0x20.toChar, 0x7e.toChar),
      3 -> Gen.choose(0x80.toChar, 0x7ff.toChar),
      3 -> Gen.choose(0x800.toChar, 0xfffd.toChar),
      1 -> Gen.choose(0xd800.toChar, 0xdfff.toChar) // raw surrogates, often lone
    )
    val strGen = for {
      n <- Gen.choose(0, 20000)
      cs <- Gen.listOfN(n, unicodeChar)
    } yield cs.mkString
    (0 until 50).foreach { i =>
      val s = strGen.apply(Gen.Parameters.default, Seed(0xE5C4A7L + i))
        .getOrElse(fail(s"gen failed at $i"))
      assert(viaScratch(s) == viaGetBytes(s), s"iter=$i len=${s.length}")
    }
  }

  test("scratch reuse: interleaved digests of different algorithms stay independent") {
    val md256 = MessageDigest.getInstance("SHA-256")
    val md384 = MessageDigest.getInstance("SHA-384")
    Rdfc10.updateDigest(md256, "abc")
    Rdfc10.updateDigest(md384, "abc")
    Rdfc10.updateDigest(md256, "def")
    Rdfc10.updateDigest(md384, "def")
    val h256 = md256.digest().map(b => f"$b%02x").mkString
    val h384 = md384.digest().map(b => f"$b%02x").mkString
    val e256 = MessageDigest.getInstance("SHA-256")
      .digest("abcdef".getBytes(UTF_8)).map(b => f"$b%02x").mkString
    val e384 = MessageDigest.getInstance("SHA-384")
      .digest("abcdef".getBytes(UTF_8)).map(b => f"$b%02x").mkString
    assert(h256 == e256)
    assert(h384 == e384)
  }
}
