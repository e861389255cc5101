package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties pinning [[graft.functions.TermCounts]] to
  * the EXACT semantics of the Column formulation it replaced in the
  * BM25 builds: terms = `filter(split(lower(text), "\\s+"), len>0)`,
  * dl = size(terms), tf = occurrence count per distinct term. The
  * byte-scan kernel must agree on every Java-`\s` whitespace class
  * member, arbitrary runs/leading/trailing whitespace, case folding,
  * and multi-byte UTF-8. */
object TermCountsProperties extends Properties("TermCounts.compute") {

  /** Reference semantics: literally the replaced plan's definition
    * (Java String ops — `split("\\s+")` and `toLowerCase` on the
    * JVM side match Spark's `split`/`lower` for these inputs; the
    * UTF8String case kernel itself is exercised by the Spark-side
    * parity test in RetrievalSpec). */
  private def reference(text: String): (Int, Map[String, Int]) = {
    val terms = text.toLowerCase.split("\\s+", -1).filter(_.nonEmpty)
    (terms.length, terms.groupBy(identity).view.mapValues(_.length).toMap)
  }

  private def viaExpr(text: String): (Int, Map[String, Int]) = {
    val row = graft.functions.TermCounts.compute(UTF8String.fromString(text))
    val dl = row.getInt(0)
    val arr = row.getArray(1)
    val m = (0 until arr.numElements()).map { i =>
      val s = arr.getStruct(i, 2)
      s.getUTF8String(0).toString -> s.getInt(1)
    }.toMap
    (dl, m)
  }

  private val ws: Gen[String] =
    Gen.oneOf(" ", "\t", "\n", "\u000B", "\f", "\r", "  ", " \t\n")
  private val word: Gen[String] = Gen.frequency(
    8 -> Gen.oneOf("a", "B", "ab", "The", "THE", "the", "x9", "Über", "日本語"),
    1 -> Gen.oneOf("\u00A0", "a\u00A0b")) // NBSP is NOT Java \s — stays inside a token
  private val text: Gen[String] = for {
    parts <- Gen.listOf(Gen.zip(word, ws).map { case (w, s) => w + s })
    lead <- ws
  } yield lead + parts.mkString

  property("agrees with the split/filter/groupBy reference") =
    forAll(text) { t => viaExpr(t) == reference(t) }

  property("dl is the sum of the tfs") = forAll(text) { t =>
    val (dl, m) = viaExpr(t)
    dl == m.values.sum
  }

  property("pathological inputs: empty, all-whitespace, one token") = {
    viaExpr("") == ((0, Map.empty[String, Int])) &&
      viaExpr(" \t\r\n\f") == ((0, Map.empty[String, Int])) &&
      viaExpr("Hello") == ((1, Map("hello" -> 1))) &&
      viaExpr("a a\ta\na") == ((4, Map("a" -> 4)))
  }
}
