package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.ops.Multimodal

/** ScalaCheck properties pinning the pigeonhole recall bound the
  * phash near-dup family's `require(maxHamming < PhashBands)` encodes
  * (VERDICT r14 #4): with the 64-bit dHash split into 8 bands of 8
  * bits, ANY pair within Hamming distance 7 agrees on at least one
  * full band — so the (band, bits) equi-join candidate generation of
  * [[graft.ops.Multimodal.phashNearDup]] and
  * [[graft.stream.StreamingPhashDedup]] loses NO pair at
  * maxHamming ≤ 7 — and 7 is EXACT: one flip per band (8 flips)
  * changes every band key, so the bound cannot be relaxed. Runs
  * against the scalar twin [[graft.ops.Multimodal.phashBandKey]];
  * MultimodalSpec bridges the twin to the Column form. */
object PhashBandProperties extends Properties("Multimodal.phashBands") {

  private val hashGen: Gen[Long] = Gen.chooseNum(Long.MinValue, Long.MaxValue)

  /** Up to `n` DISTINCT bit positions (sets may dedup below n —
    * fewer flips only strengthens the recall case). */
  private val upTo7Flips: Gen[Set[Int]] =
    Gen.choose(0, 7).flatMap(n => Gen.containerOfN[Set, Int](n, Gen.choose(0, 63)))

  property("pigeonhole recall: ≤7 bit flips always leave at least one band intact") =
    forAll(hashGen, upTo7Flips) { (h, fs) =>
      val h2 = fs.foldLeft(h)((a, b) => a ^ (1L << b))
      (0 until Multimodal.PhashBands).exists(b =>
        Multimodal.phashBandKey(h, b) == Multimodal.phashBandKey(h2, b))
    }

  property("bands partition the 64 bits: keys reconstruct the hash") =
    forAll(hashGen) { h =>
      (0 until Multimodal.PhashBands)
        .map(b => Multimodal.phashBandKey(h, b) << (b * 8)).reduce(_ | _) == h
    }

  property("the bound is exact: one flip per band (Hamming 8) changes every band key") =
    forAll(hashGen) { h =>
      val h2 = h ^ 0x0101010101010101L
      (0 until Multimodal.PhashBands).forall(b =>
        Multimodal.phashBandKey(h, b) != Multimodal.phashBandKey(h2, b))
    }
}
