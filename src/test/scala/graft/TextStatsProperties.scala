package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties pinning [[graft.functions.TextStats]]'s one
  * byte scan to the Column formulation it replaced: tokens = maximal
  * runs of non-space bytes (`split(text, " ")` minus empties),
  * `sum_tok_len` in CODE POINTS (not bytes — multi-byte text is where
  * a byte-counting scan would silently diverge), stopword hits counted
  * per OCCURRENCE. */
object TextStatsProperties extends Properties("TextStats.compute") {

  private def reference(text: String): (Long, Long, Long, Long) = {
    val toks = text.split(" ", -1).filter(_.nonEmpty).toSeq
    (toks.length.toLong,
      toks.distinct.length.toLong,
      toks.map(t => t.codePointCount(0, t.length).toLong).sum,
      toks.count(graft.functions.TextStats.Stopwords.contains).toLong)
  }

  private def viaExpr(text: String): (Long, Long, Long, Long) = {
    val row = graft.functions.TextStats.compute(UTF8String.fromString(text))
    (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
  }

  private val word: Gen[String] = Gen.frequency(
    6 -> Gen.oneOf("alpha", "beta", "x", "the", "of", "in"),
    2 -> Gen.oneOf("日本語", "héllo", "naïve", "😀"),
    1 -> Gen.const(""))
  private val text: Gen[String] = for {
    words <- Gen.listOf(word)
    lead <- Gen.choose(0, 2).map(" " * _)
    trail <- Gen.choose(0, 2).map(" " * _)
  } yield lead + words.mkString(" ") + trail

  property("agrees with the split/filter/distinct reference") =
    forAll(text) { t => viaExpr(t) == reference(t) }

  property("pathological inputs: empty, all-space, stopword-only") = {
    viaExpr("") == ((0L, 0L, 0L, 0L)) &&
      viaExpr("    ") == ((0L, 0L, 0L, 0L)) &&
      viaExpr("the the the") == ((3L, 1L, 9L, 3L)) &&
      viaExpr("日本語") == ((1L, 1L, 3L, 0L)) // 3 code points, 9 bytes
  }
}
