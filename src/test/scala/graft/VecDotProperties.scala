package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties pinning [[graft.functions.VecDot]]'s two
  * kernels (null-checking and strict) to the zip-multiply-sum
  * definition, including the length-mismatch (min-length) and
  * null-element contracts — completing the property coverage of the
  * codegen expression family. */
object VecDotProperties extends Properties("VecDot.compute") {

  private def arr(xs: Seq[java.lang.Long]): GenericArrayData =
    new GenericArrayData(xs.toArray[Any])

  private val vec: Gen[List[Long]] = Gen.listOf(Gen.choose(-1000L, 1000L))

  property("agrees with the zip-multiply-sum reference") =
    forAll(vec, vec) { (a, b) =>
      val expect = a.zip(b).map { case (x, y) => x * y }.sum
      graft.functions.VecDot.compute(
        arr(a.map(Long.box)), arr(b.map(Long.box))) == expect &&
        graft.functions.VecDot.computeStrict(
          arr(a.map(Long.box)), arr(b.map(Long.box))) == expect
    }

  property("length mismatch truncates to the shorter vector") =
    forAll(vec, vec, Gen.choose(0, 5)) { (a, b, extra) =>
      val padded = b ++ Seq.fill(extra)(7L)
      graft.functions.VecDot.compute(arr(a.map(Long.box)), arr(padded.map(Long.box))) ==
        a.zip(padded).map { case (x, y) => x * y }.sum
    }

  property("a null element nulls the dot product") =
    forAll(vec, Gen.choose(0, 3)) { (a0, at) =>
      val a = a0 ++ Seq(1L, 2L) // ensure non-empty with room for the null
      val withNull: Seq[java.lang.Long] =
        a.map(Long.box).updated(math.min(at, a.length - 1), null: java.lang.Long)
      graft.functions.VecDot.compute(arr(withNull), arr(a.map(Long.box))) == null
    }
}
