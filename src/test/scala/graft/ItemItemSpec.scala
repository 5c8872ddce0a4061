package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ml.ItemItem

/** Unit laws of the item-item kernel primitives (the query-level
  * result is pinned by ComposedOpsSpec's hand-computed fixture and the
  * DuckDB oracle; these cover the primitive structures directly —
  * both n_i lookup layouts and the sorted-scan's count, cosine and
  * tie-break semantics against a brute-force reference). */
class ItemItemSpec extends AnyFunSuite {

  test("buildLookup: dense and sparse layouts agree on every id") {
    val ids = Array(1L, 3L, 7L, 8L, 200L)
    val counts = Array(5L, 2L, 9L, 1L, 4L)
    val dense = ItemItem.buildLookup(ids.take(4), counts.take(4)) // compact → dense
    val sparse = ItemItem.buildLookup(ids, counts) // id 200 ≫ 4n → hash
    for (i <- 0 until 4)
      assert(dense.get(ids(i)) == counts(i))
    for (i <- ids.indices)
      assert(sparse.get(ids(i)) == counts(i))
  }

  test("scanSorted matches a brute-force count+rank on random pair streams") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 20) {
      val nItems = 2 + rnd.nextInt(12)
      val ni = Array.tabulate(nItems)(i => 1L + rnd.nextInt(50))
      val ids = Array.tabulate(nItems)(_.toLong)
      val lookup = ItemItem.buildLookup(ids, ni)
      // random directed pair multiset (a ≠ b)
      val pairs = Array.fill(rnd.nextInt(400)) {
        val a = rnd.nextInt(nItems)
        var b = rnd.nextInt(nItems)
        if (b == a) b = (b + 1) % nItems
        (a.toLong << 32) | b.toLong
      }
      val k = 1 + rnd.nextInt(4)
      val sorted = pairs.clone(); java.util.Arrays.sort(sorted)
      val got = ItemItem.scanSorted(sorted, sorted.length, lookup, k)
        .map { case (a, r, b, n, c) => (a, r) -> ((b, n, c)) }.toMap
      // brute force
      val counts = pairs.groupBy(identity).map { case (pk, v) =>
        ((pk >>> 32, pk & 0xFFFFFFFFL), v.length.toLong)
      }
      val want = counts.groupBy(_._1._1).flatMap { case (a, m) =>
        m.toSeq.map { case ((_, b), n) =>
          (b, n, n.toDouble / math.sqrt((ni(a.toInt) * ni(b.toInt)).toDouble))
        }.sortBy { case (b, _, c) => (-c, b) }.take(k).zipWithIndex.map {
          case ((b, n, c), i) => (a, i + 1) -> ((b, n, c))
        }
      }
      assert(got == want, s"trial $trial")
    }
  }

  test("pairPartitions law: floor, 128MB-slice growth, 1024 clamp, overflow saturation") {
    // floor: tiny estimates stay at the session default
    assert(ItemItem.pairPartitions(32, 600_000L, 15_000L) == 32)
    // sf10 shape: 60M lineitems / 1.5M customers → 2.4G est → 150 slices
    assert(ItemItem.pairPartitions(32, 60_000_000L, 1_500_000L) == 150)
    // sf100 shape: 600M / 15M → 24G est → upper clamp binds at 1024
    assert(ItemItem.pairPartitions(32, 600_000_000L, 15_000_000L) == 1024)
    // failed probes and empty customers fail CLOSED onto the clamp
    assert(ItemItem.pairPartitions(32, Long.MaxValue, 15_000L) == 1024)
    assert(ItemItem.pairPartitions(32, 600_000L, Long.MaxValue) == 1024)
    assert(ItemItem.pairPartitions(32, 600_000L, 0L) == 1024)
    // overflow saturates (never collapses to the floor): L ~ 2^40 rows
    // of a dense corpus would overflow L·(L/C) as a plain multiply
    assert(ItemItem.pairPartitions(32, 1L << 40, 4L) == 1024)
  }

  test("emitPartitions law: unfloored need, engages past gate scale, clamps") {
    // gate scale: sf0.1 shape 6M/150k → 240M est → need 7 (< 32 actual
    // partitions → caller never widens)
    assert(ItemItem.emitPartitions(6_000_000L, 150_000L) == 7)
    // sf10 shape: 2.4G est → 75 — the first scale that widens
    assert(ItemItem.emitPartitions(60_000_000L, 1_500_000L) == 75)
    // sf20 shape (the measured spill cliff): 4.8G est → 150, the
    // measured wall sweet spot (~32M pairs/task)
    assert(ItemItem.emitPartitions(120_000_000L, 3_000_000L) == 150)
    // clamped at 1024 like the reduce side
    assert(ItemItem.emitPartitions(6_000_000_000L, 15_000_000L) == 1024)
    // fail-closed probes take the clamp; an empty-lineitem corpus
    // with live customers estimates 0 and never widens
    assert(ItemItem.emitPartitions(Long.MaxValue, 15_000L) == 1024)
    assert(ItemItem.emitPartitions(600_000L, 0L) == 1024)
    assert(ItemItem.emitPartitions(0L, 15_000L) == 0)
    assert(ItemItem.emitPartitions(1L << 40, 4L) == 1024)
  }

  test("scanSorted tie-break: equal cosine prefers the smaller neighbor") {
    // items 1..3 each with n_i = 4; pairs (0,1),(0,2),(0,3) each once:
    // identical cosines — top-2 must be neighbors 1 and 2
    val lookup = ItemItem.buildLookup(Array(0L, 1L, 2L, 3L), Array(4L, 4L, 4L, 4L))
    val buf = Array((0L << 32) | 3L, (0L << 32) | 1L, (0L << 32) | 2L)
    java.util.Arrays.sort(buf)
    val out = ItemItem.scanSorted(buf, 3, lookup, 2)
    assert(out.map(r => (r._2, r._3)).toList == List((1, 1L), (2, 2L)))
  }
}
