package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the [[graft.functions.BigramStats]]
  * byte-scan against a plain Scala reference built from the SPEC
  * (`split(text, " ")` minus empties, consecutive pairs joined by one
  * space): the codegen path must agree on arbitrary spacing, token
  * multiplicity, and non-ASCII content — not just the fixture docs. */
object BigramStatsProperties extends Properties("BigramStats.compute") {

  /** Reference semantics, straight off the oracle definition. */
  private def reference(text: String): (Long, Long, Long) = {
    val ws = text.split(" ", -1).filter(_.nonEmpty)
    if (ws.length < 2) (0L, 0L, 0L)
    else {
      val bgs = ws.sliding(2).map(_.mkString(" ")).toSeq
      val counts = bgs.groupBy(identity).view.mapValues(_.size.toLong)
      (bgs.size.toLong, counts.size.toLong, counts.values.max)
    }
  }

  private def viaExpr(text: String): (Long, Long, Long) = {
    val r = graft.functions.BigramStats.compute(UTF8String.fromString(text))
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  // words over a tiny alphabet (forces repeats → max_count > 1 often),
  // plus a few multi-byte UTF-8 tokens; glued with 1-3 spaces and
  // random leading/trailing runs
  private val word: Gen[String] = Gen.frequency(
    8 -> Gen.oneOf("a", "b", "ab", "ba", "x"),
    1 -> Gen.oneOf("ü", "日本", "héllo"))
  private val gap: Gen[String] = Gen.choose(1, 3).map(" " * _)
  private val text: Gen[String] = for {
    words <- Gen.listOf(word)
    gaps <- Gen.listOfN(math.max(words.size - 1, 0), gap)
    lead <- Gen.choose(0, 2).map(" " * _)
    trail <- Gen.choose(0, 2).map(" " * _)
  } yield lead + words.zipAll(gaps, "", "").map { case (w, g) => w + g }.mkString + trail

  property("agrees with the split/sliding reference on arbitrary spacing") =
    forAll(text)(t => viaExpr(t) == reference(t))

  property("n_distinct <= n_bigrams and max_count <= n_bigrams") =
    forAll(text) { t =>
      val (n, d, m) = viaExpr(t)
      d <= n && m <= n && (n == 0L || (d >= 1L && m >= 1L))
    }

  property("token-preserving space inflation changes nothing") =
    forAll(text) { t =>
      viaExpr(t.replace(" ", "  ")) == viaExpr(t)
    }
}
