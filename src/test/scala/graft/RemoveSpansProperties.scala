package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the q56 span-removal kernel pair:
  * [[graft.functions.ShingleList]] must be the positional (non-
  * distinct) form of the shingle family's pinned tokenization, and
  * [[graft.functions.RemoveSpans]] must agree with the obvious
  * split/filter/mkString reference on arbitrary spacing, multi-byte
  * UTF-8, unsorted/duplicate/out-of-range span starts — including the
  * all-removed and nothing-removed extremes. */
object RemoveSpansProperties extends Properties("RemoveSpans") {

  private def tokens(text: String): Array[String] = text.split(" ", -1)

  /** Reference for shingle_list: ALL n-grams in positional order. */
  private def shingleListRef(text: String, n: Int): Seq[String] = {
    val ws = tokens(text)
    if (ws.length < n) Seq.empty else ws.sliding(n).map(_.mkString(" ")).toSeq
  }

  private def shingleListExpr(text: String, n: Int): Seq[String] = {
    val arr = graft.functions.ShingleList.compute(UTF8String.fromString(text), n)
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  /** Reference for remove_spans: mark covered positions, keep the
    * rest. Negative starts cover nothing (the documented contract —
    * without the filter a start in (-k, 0) would cover 0..s+k-1 and
    * delete leading tokens). */
  private def removeSpansRef(text: String, starts: Seq[Int], k: Int): (Int, Int, String) = {
    val ws = tokens(text)
    val covered = starts.filter(_ >= 0).flatMap(s => s until (s + k)).toSet
    val kept = ws.zipWithIndex.collect { case (w, i) if !covered.contains(i) => w }
    (ws.length, kept.length, kept.mkString(" "))
  }

  private def removeSpansExpr(text: String, starts: Seq[Int], k: Int): (Int, Int, String) = {
    val row = graft.functions.RemoveSpans.compute(
      UTF8String.fromString(text),
      new GenericArrayData(starts.toArray[Any]), k)
    (row.getInt(0), row.getInt(1), row.getUTF8String(2).toString)
  }

  private val word: Gen[String] = Gen.frequency(
    8 -> Gen.oneOf("a", "b", "ab", "ba", "x", ""),
    1 -> Gen.oneOf("ü", "日本", "héllo"))
  private val text: Gen[String] = for {
    words <- Gen.listOf(word)
    lead <- Gen.choose(0, 2).map(" " * _)
    trail <- Gen.choose(0, 2).map(" " * _)
  } yield lead + words.mkString(" ") + trail

  // starts deliberately unsorted, duplicated, sometimes past the end,
  // and sometimes NEGATIVE (SQL callers pass arbitrary arrays; both
  // sides must treat out-of-range as covering nothing)
  private val starts: Gen[List[Int]] = Gen.listOf(Gen.choose(-3, 12))

  property("shingle_list agrees with the split(-1)/sliding reference, in order") =
    forAll(text, Gen.choose(1, 4)) { (t, n) =>
      shingleListExpr(t, n) == shingleListRef(t, n)
    }

  property("shingle_list at position i IS the shingle of tokens i..i+n-1") =
    forAll(text, Gen.choose(1, 4)) { (t, n) =>
      val ws = tokens(t)
      shingleListExpr(t, n).zipWithIndex.forall { case (sh, i) =>
        sh == ws.slice(i, i + n).mkString(" ")
      }
    }

  property("remove_spans agrees with the covered-set reference") =
    forAll(text, starts, Gen.choose(1, 4)) { (t, sp, k) =>
      removeSpansExpr(t, sp, k) == removeSpansRef(t, sp, k)
    }

  property("no spans → byte-identical round trip") =
    forAll(text) { t =>
      removeSpansExpr(t, Nil, 3) == ((tokens(t).length, tokens(t).length, t))
    }

  property("span at 0 with k >= n_tokens removes everything") =
    forAll(text) { t =>
      val n = tokens(t).length
      removeSpansExpr(t, Seq(0), n) == ((n, 0, ""))
    }
}
