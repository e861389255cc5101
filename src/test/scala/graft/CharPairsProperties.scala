package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties pinning [[graft.functions.CharPairs]] to the
  * q61 oracle's definition: words = `split(text, " ")` keeping
  * empties, and for each word every `substr(word, i, 2)` for
  * i ∈ [1, length-1] in CHARACTER (code-point) addressing — so the
  * byte-slice kernel must agree on multi-byte UTF-8, where a byte-pair
  * formulation would split a code point. Order and multiplicity both
  * matter (the corpus-wide counts are the product). */
object CharPairsProperties extends Properties("CharPairs.compute") {

  /** Reference semantics: per word, sliding window of 2 code points. */
  private def reference(text: String): Seq[String] = {
    text.split(" ", -1).toSeq.flatMap { w =>
      val cps = w.codePoints().toArray
      if (cps.length < 2) Seq.empty
      else cps.sliding(2).map(p => new String(p, 0, p.length)).toSeq
    }
  }

  private def viaExpr(text: String): Seq[String] = {
    val arr = graft.functions.CharPairs.compute(UTF8String.fromString(text))
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  private val word: Gen[String] = Gen.frequency(
    8 -> Gen.oneOf("a", "b", "ab", "abc", "spark", "x", ""),
    2 -> Gen.oneOf("ü", "üö", "日本語", "héllo", "naïve"),
    1 -> Gen.oneOf("😀x", "a😀b")) // surrogate-pair emoji
  private val text: Gen[String] = for {
    words <- Gen.listOf(word)
    lead <- Gen.choose(0, 2).map(" " * _)
    trail <- Gen.choose(0, 2).map(" " * _)
  } yield lead + words.mkString(" ") + trail

  property("agrees with the split/codePoints/sliding reference") =
    forAll(text) { t => viaExpr(t) == reference(t) }

  property("pair count = Σ max(0, |word|-1) over code-point lengths") =
    forAll(text) { t =>
      val expected = t.split(" ", -1)
        .map(w => math.max(0, w.codePointCount(0, w.length) - 1).toLong).sum
      viaExpr(t).size.toLong == expected
    }

  property("pathological inputs: empty, all-space, single-char words") = {
    viaExpr("").isEmpty && viaExpr("   ").isEmpty &&
      viaExpr("a b c").isEmpty &&
      viaExpr("ab") == Seq("ab") &&
      viaExpr("日本語") == Seq("日本", "本語")
  }
}
