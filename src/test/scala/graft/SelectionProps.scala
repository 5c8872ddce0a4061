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

  /** sel_source_cap's per-source keep threshold (independent of the
    * Spark rendering): full rate at/under the cap, else the 16-bit
    * floor of cap/n_source. */
  private def capThr(cap: Long, n: Long): Long =
    if (n <= cap) 65536L else cap * 65536L / n

  /** At a FIXED cap, growing a source can only LOWER its threshold —
    * so re-crawling one source (rest of the corpus pinned) never
    * re-admits a dropped doc. Corpus-wide growth raises the cap
    * itself and CAN re-admit: the cap constrains share, not volume,
    * which is why cap and n vary independently here. */
  property("source-cap threshold is monotone non-increasing in source size") =
    forAll(Gen.chooseNum(1L, 1000000L),
           Gen.chooseNum(1L, 1000000L), Gen.chooseNum(1L, 1000000L)) {
      (cap, a, b) =>
        capThr(cap, math.min(a, b)) >= capThr(cap, math.max(a, b))
    }

  /** The realized keep rate t/65536 sits in (cap/n - 1/65536, cap/n]:
    * the cap is honored (never exceeded in rate) to hash granularity. */
  property("source-cap rate is the exact 16-bit floor of cap/n_source") =
    forAll(Gen.chooseNum(1L, 100000L), Gen.chooseNum(1L, 100000L)) {
      (cap, extra) =>
        val n = cap + extra // strictly over the cap
        val t = capThr(cap, n)
        t * n <= cap * 65536L && (t + 1) * n > cap * 65536L
    }

  /** sel_drift's per-bucket PSI integrand (independent recompute). */
  private def driftC(r: Long, n: Long, rTot: Long, nTot: Long): Long = {
    val lr = FixedLog(r + 1) - FixedLog(n + 1) -
      (FixedLog(rTot + 256) - FixedLog(nTot + 256))
    ((r + 1) * (nTot + 256) - (n + 1) * (rTot + 256)) * lr
  }

  private val genCnt = Gen.chooseNum(0L, 100000L)
  private val genTot = Gen.chooseNum(1L, 1000000L)

  property("drift contribution is symmetric in the two snapshots") =
    forAll(genCnt, genCnt, genTot, genTot) { (r, n, rt, nt) =>
      driftC(r, n, rt, nt) == driftC(n, r, nt, rt)
    }

  property("drift vanishes on identical counts, never negative at equal totals") =
    forAll(genCnt, genCnt, genTot) { (r, n, tot) =>
      driftC(r, r, tot, tot) == 0L && driftC(r, n, tot, tot) >= 0L
    }
}
