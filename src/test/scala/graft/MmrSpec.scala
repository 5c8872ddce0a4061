package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ml.Recommender.mmrSelect

/** MMR invariants from SURVEY.md §5.4-5: pure-Scala, no Spark session. */
class MmrSpec extends AnyFunSuite {

  private def unit(xs: Double*): Array[Double] = {
    val n = math.sqrt(xs.map(x => x * x).sum)
    xs.map(_ / n).toArray
  }

  // three similar items pointing ~east, one orthogonal pointing north
  private val cands = Seq(
    (1, 0.95, unit(1.0, 0.0)),
    (2, 0.90, unit(0.99, 0.1)),
    (3, 0.85, unit(0.98, 0.15)),
    (4, 0.40, unit(0.0, 1.0)))

  test("lambda=1 degenerates to relevance order") {
    assert(mmrSelect(cands, k = 3, lambda = 1.0).map(_._1) == Seq(1, 2, 3))
  }

  test("lambda=0 maximizes diversity after the relevance seed") {
    // first pick is always argmax relevance (item 1); with lambda=0 the
    // second pick must be the orthogonal item 4, not the similar 2/3.
    val picked = mmrSelect(cands, k = 2, lambda = 0.0).map(_._1)
    assert(picked == Seq(1, 4))
  }

  test("output is a subset of the candidate pool with length min(k, pool)") {
    val out = mmrSelect(cands, k = 10, lambda = 0.5)
    assert(out.length == cands.length)
    assert(out.map(_._1).toSet.subsetOf(cands.map(_._1).toSet))
    assert(out.map(_._1).distinct.length == out.length)
  }

  test("empty pool yields empty result") {
    assert(mmrSelect(Nil, k = 5, lambda = 0.5).isEmpty)
  }

  test("ties break on first occurrence (np.argmax semantics)") {
    val tied = Seq(
      (7, 0.5, unit(1.0, 0.0)),
      (8, 0.5, unit(0.0, 1.0)))
    assert(mmrSelect(tied, k = 1, lambda = 1.0).map(_._1) == Seq(7))
  }
}
