package graft

import graft.operators.Dedup

/** Both connected-component paths — the bounded-collect union-find
  * fast path and the distributed doubling fixpoint — must produce the
  * identical min-label clustering. The chain fixture (diameter 7)
  * forces real propagation; the two-component fixture checks
  * separation; the empty fixture checks the degenerate case. */
class ClustersSpec extends SparkSpec {
  import spark.implicits._

  private def run(pairs: Seq[(Long, Long)], distributed: Boolean) =
    Dedup.clusters(
        pairs.toDF("id_a", "id_b"),
        driverMaxEdges = if (distributed) -1L else Long.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain collapses to min label on both paths") {
    val chain = (1L to 7L).sliding(2).map(s => (s(0), s(1))).toSeq
    val byDriver = run(chain, distributed = false)
    val byLoop = run(chain, distributed = true)
    assert(byDriver == (1L to 7L).map(_ -> 1L).toMap)
    assert(byLoop == byDriver)
  }

  test("disjoint components stay separate on both paths") {
    val pairs = Seq((10L, 11L), (11L, 12L), (20L, 21L))
    val byDriver = run(pairs, distributed = false)
    val byLoop = run(pairs, distributed = true)
    assert(byDriver == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
    assert(byLoop == byDriver)
  }

  test("empty pair list yields empty clustering on both paths") {
    assert(run(Nil, distributed = false).isEmpty)
    assert(run(Nil, distributed = true).isEmpty)
  }
}
