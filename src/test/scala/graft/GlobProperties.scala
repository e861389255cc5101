package graft

import graft.ops.Owners
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck property tests for the pinned glob dialect (SURVEY §5
  * strategy item 2; risk #2): invariants that must hold for EVERY
  * pattern/path, not just the fixture set. Pure string-level — the
  * Column translator is checked for parity against this one in
  * OwnersSpec. */
object GlobProperties extends Properties("Owners.globToRegex") {

  private val segChar: Gen[Char] = Gen.oneOf(('a' to 'z') ++ ('0' to '9') :+ '_' :+ '-')
  private val segment: Gen[String] = Gen.nonEmptyListOf(segChar).map(_.mkString).map(_.take(8))
  private val path: Gen[String] =
    Gen.nonEmptyListOf(segment).map(_.take(4).mkString("/"))
  private val patChar: Gen[String] =
    Gen.frequency(6 -> segChar.map(_.toString), 1 -> Gen.const("*"), 1 -> Gen.const("?"))
  private val patSegment: Gen[String] =
    Gen.nonEmptyListOf(patChar).map(_.take(8).mkString)
  private val pattern: Gen[String] =
    Gen.nonEmptyListOf(patSegment).map(_.take(4).mkString("/"))

  private def m(glob: String, p: String): Boolean = p.matches(Owners.globToRegex(glob))

  property("bare * matches every path (JS special case)") =
    forAll(path)(p => m("*", p))

  property("a special-free pattern matches itself") =
    forAll(path)(p => m(p, p))

  property("* and ? never match across a slash: segment counts must agree") =
    forAll(pattern, path) { (g, p) =>
      g == "*" || !m(g, p) || g.count(_ == '/') == p.count(_ == '/')
    }

  property("? consumes exactly one char: matched path length >= pattern's non-* length") =
    forAll(pattern, path) { (g, p) =>
      !m(g, p) || p.length >= g.count(c => c != '*')
    }

  property("segment-wise composition: s1~g1 and s2~g2 => s1/s2 ~ g1/g2") =
    forAll(patSegment, segment, patSegment, segment) { (g1, s1, g2, s2) =>
      !(m(g1, s1) && m(g2, s2)) || m(s"$g1/$g2", s"$s1/$s2")
    }

  property("appending ? to a segment pattern demands exactly one more char") =
    forAll(patSegment, segment) { (g, s) =>
      !m(g, s) || (m(g + "?", s + "x") && !m(g + "?", s + "/"))
    }
}
