package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties pinning [[graft.functions.WinnowMinima]] to
  * an independently-written reference: hash every character k-gram
  * with the portable 60-bit md5 prefix (the scheme every oracle-parity
  * hash in this repo shares), then take the minimum of each forward
  * window of w gram positions. The expression's fused single pass must
  * agree with the compose-from-parts definition on arbitrary text —
  * including multi-byte UTF-8, where byte-addressed slicing would
  * diverge from the String character addressing both sides use. */
object WinnowMinimaProperties extends Properties("WinnowMinima.compute") {

  private def portable(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString.take(15), 16)

  private def reference(text: String, k: Int, w: Int): Seq[Long] = {
    val grams = text.sliding(k).filter(_.length == k).map(portable).toSeq
    grams.indices.map(i => grams.slice(i, math.min(i + w, grams.length)).min)
  }

  private def viaExpr(text: String, k: Int, w: Int): Seq[Long] = {
    val arr = graft.functions.WinnowMinima.compute(text, k, w)
    (0 until arr.numElements()).map(arr.getLong)
  }

  private val text: Gen[String] = for {
    chars <- Gen.listOf(Gen.frequency(
      8 -> Gen.alphaLowerChar, 2 -> Gen.const(' '), 1 -> Gen.oneOf('é', '日', 'ü')))
  } yield chars.mkString

  property("agrees with the hash-then-window-min reference") =
    forAll(text, Gen.choose(1, 6), Gen.choose(1, 5)) { (t, k, w) =>
      viaExpr(t, k, w) == reference(t, k, w)
    }

  property("too-short docs yield an empty array") =
    forAll(Gen.choose(1, 10)) { k =>
      viaExpr("x" * math.max(0, k - 1), k, 4).isEmpty
    }

  property("w = 1 degenerates to the raw gram hashes") =
    forAll(text, Gen.choose(1, 4)) { (t, k) =>
      viaExpr(t, k, 1) == reference(t, k, 1)
    }
}
