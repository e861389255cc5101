package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties pinning [[graft.functions.SimHash60]]'s fused
  * single pass to the textbook definition composed from parts: bit b
  * of the fingerprint is 1 iff Σ over token OCCURRENCES of
  * (+1 if bit b of the token's portable 60-bit md5 hash is set,
  * else −1) is strictly positive. Also pins the structural properties
  * the near-dup family relies on: permutation invariance (the sketch
  * sums commute) and count sensitivity. */
object SimHashProperties extends Properties("SimHash60.compute") {

  private def portable(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString.take(15), 16)

  private def reference(tokens: Seq[String]): Long = {
    val counts = new Array[Int](60)
    tokens.foreach { t =>
      val h = portable(t)
      (0 until 60).foreach(b =>
        counts(b) += (if (((h >> b) & 1L) == 1L) 1 else -1))
    }
    (0 until 60).foldLeft(0L)((fp, b) => if (counts(b) > 0) fp | (1L << b) else fp)
  }

  private def viaExpr(tokens: Seq[String]): Long =
    graft.functions.SimHash60.compute(
      new GenericArrayData(tokens.map(t => UTF8String.fromString(t)).toArray[Any]))

  private val token: Gen[String] = Gen.frequency(
    8 -> Gen.oneOf("alpha", "beta", "gamma", "x", "yz"),
    1 -> Gen.oneOf("日本", "héllo", ""))
  private val tokens: Gen[List[String]] = Gen.listOf(token)

  property("agrees with the per-bit vote reference") =
    forAll(tokens) { ts => viaExpr(ts) == reference(ts) }

  property("permutation invariant (votes commute)") =
    forAll(tokens) { ts =>
      viaExpr(ts) == viaExpr(scala.util.Random.javaRandomToRandom(
        new java.util.Random(42)).shuffle(ts))
    }

  property("single token: fingerprint IS the token hash (one positive vote per set bit)") =
    forAll(token) { t => viaExpr(Seq(t)) == portable(t) }

  property("fingerprint fits in 60 bits") =
    forAll(tokens) { ts => (viaExpr(ts) >>> 60) == 0L }
}
