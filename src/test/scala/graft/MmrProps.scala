package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}
import graft.ml.Recommender.mmrSelect

/** Property-based invariants (SURVEY.md §5.4) for the hand-written
  * algorithms — the parts with no oracle to lean on. */
object MmrProps extends Properties("graft") {

  private val genCand: Gen[(Int, Double, Array[Double])] = for {
    id <- Gen.choose(0, 1000)
    rel <- Gen.choose(0.0, 1.0)
    x <- Gen.choose(-1.0, 1.0)
    y <- Gen.choose(-1.0, 1.0)
  } yield (id, rel, Array(x, y))

  private val genPool: Gen[List[(Int, Double, Array[Double])]] =
    Gen.listOf(genCand).map(_.distinctBy(_._1))

  property("mmr output is a duplicate-free subset of min(k,|pool|) size") =
    forAll(genPool, Gen.choose(0, 12)) { (pool, k) =>
      val out = mmrSelect(pool, k, lambda = 0.5)
      val ids = out.map(_._1)
      ids.length == math.min(math.max(k, 0), pool.length) &&
        ids.distinct.length == ids.length &&
        ids.toSet.subsetOf(pool.map(_._1).toSet)
    }

  property("mmr with lambda=1 is exactly relevance-descending order") =
    forAll(genPool, Gen.choose(1, 12)) { (pool, k) =>
      pool.nonEmpty ==> {
        val out = mmrSelect(pool, k, lambda = 1.0).map(_._1)
        // reference semantics: argmax of relevance, first occurrence wins
        val expected = pool.zipWithIndex
          .sortBy { case ((_, rel, _), i) => (-rel, i) }
          .take(math.min(k, pool.length)).map(_._1._1)
        out == expected
      }
    }

  property("mmr is deterministic") =
    forAll(genPool, Gen.choose(0, 8)) { (pool, k) =>
      mmrSelect(pool, k, 0.3).map(_._1) == mmrSelect(pool, k, 0.3).map(_._1)
    }

  property("jaccard size bound is lossless (the charGramPairs pre-filter)") =
    forAll { (a: Set[Int], b: Set[Int]) =>
      (a.nonEmpty && b.nonEmpty) ==> {
        val j = (a & b).size.toDouble / (a | b).size
        val bound = math.min(a.size, b.size).toDouble / math.max(a.size, b.size)
        j <= bound + 1e-12
      }
    }

  property("lsh plane coefficients are ±1 and deterministic") =
    forAll(Gen.choose(0, 15), Gen.choose(1, 128)) { (j, dim) =>
      val c = graft.functions.VectorFunctions.planeCoeffs(j, dim)
      c.length == dim && c.forall(v => v == 1 || v == -1) &&
        c == graft.functions.VectorFunctions.planeCoeffs(j, dim)
    }
}
