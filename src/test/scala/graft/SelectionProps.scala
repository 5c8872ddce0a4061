package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.functions.FixedLog

/** Property pins for the FixedLog fixed-point-log2 kernel that the
  * selection operators' cross-engine exactness rests on. */
object SelectionProps extends Properties("selection") {

  private val genPos: Gen[Long] =
    Gen.oneOf(
      Gen.chooseNum(1L, 4096L),
      Gen.chooseNum(1L, Long.MaxValue),
      Gen.chooseNum(0, 62).map(1L << _))

  property("llog is floor(256*log2 n) within a one-sided 2/256 error") =
    forAll(genPos) { n =>
      val want = math.floor(256.0 * math.log(n.toDouble) / math.log(2.0)).toLong
      val got = FixedLog(n)
      got <= want && got >= want - 2
    }

  property("llog is monotone non-decreasing") =
    forAll(genPos, genPos) { (a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      FixedLog(lo) <= FixedLog(hi)
    }

  property("llog of a doubling adds exactly 256 (scale invariance)") =
    forAll(Gen.chooseNum(1L, Long.MaxValue / 2)) { n =>
      FixedLog(2 * n) == FixedLog(n) + 256
    }

  /** The additivity the per-doc scoring relies on: a doc's score is
    * the sum of its tokens' weights, so concatenating two docs sums
    * their scores (plus the shared per-token denominator term). */
  property("DSIR-style scores are additive under doc concatenation") =
    forAll(Gen.listOf(Gen.chooseNum(1L, 1000L)),
           Gen.listOf(Gen.chooseNum(1L, 1000L))) { (a, b) =>
      def score(ns: Seq[Long]) = ns.map(FixedLog(_)).sum
      score(a ++ b) == score(a) + score(b)
    }
}
