package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties pinning [[graft.functions.ShingleSet]] to
  * the EXACT semantics of the Column formulation it replaced:
  * `split(text, " ")` with limit -1 (empty words from consecutive /
  * leading / trailing spaces are KEPT), shingle i = words i..i+n-1
  * joined by single spaces, distinct, fewer than n words → empty.
  * The byte-slice kernel must agree on arbitrary spacing and
  * multi-byte UTF-8 — including the pathological all-space and empty
  * documents. */
object ShingleSetProperties extends Properties("ShingleSet.compute") {

  /** Reference semantics: literally the replaced plan's definition. */
  private def reference(text: String, n: Int): Set[String] = {
    val ws = text.split(" ", -1)
    if (ws.length < n) Set.empty
    else ws.sliding(n).map(_.mkString(" ")).toSet
  }

  private def viaExpr(text: String, n: Int): Set[String] = {
    val arr = graft.functions.ShingleSet.compute(UTF8String.fromString(text), n)
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString).toSet
  }

  private val word: Gen[String] = Gen.frequency(
    8 -> Gen.oneOf("a", "b", "ab", "ba", "x", ""),
    1 -> Gen.oneOf("ü", "日本", "héllo"))
  private val text: Gen[String] = for {
    words <- Gen.listOf(word)
    lead <- Gen.choose(0, 2).map(" " * _)
    trail <- Gen.choose(0, 2).map(" " * _)
  } yield lead + words.mkString(" ") + trail

  property("agrees with the split(-1)/sliding/distinct reference") =
    forAll(text, Gen.choose(1, 4)) { (t, n) =>
      viaExpr(t, n) == reference(t, n)
    }

  property("distinct within the row: no duplicates in the output array") =
    forAll(text, Gen.choose(1, 4)) { (t, n) =>
      val arr = graft.functions.ShingleSet.compute(UTF8String.fromString(t), n)
      val vals = (0 until arr.numElements()).map(arr.getUTF8String)
      vals.distinct.size == vals.size
    }

  property("pathological inputs: empty and all-space documents") = {
    viaExpr("", 3).isEmpty &&
      viaExpr("   ", 5) == reference("   ", 5) &&
      viaExpr("   ", 3) == reference("   ", 3) && // 4 empty words → "  "
      viaExpr("a", 1) == Set("a")
  }
}
