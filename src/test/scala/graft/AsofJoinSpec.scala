package graft

import graft.operators.AsofJoin

/** AsofJoin edge semantics: inclusive equality, no-match nulls,
  * carry-forward across interleaved times, per-key isolation. */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("matches latest right row at-or-before each left time") {
    val left = Seq((1L, 10L, "e1"), (1L, 20L, "e2"), (1L, 5L, "e0"))
      .toDF("k", "t", "ev")
    val right = Seq((1L, 10L, "r10"), (1L, 15L, "r15"))
      .toDF("k", "t", "p")
    val out = AsofJoin.asofJoin(left, "k", "t", right, "k", "t", Seq("p"))
      .select("ev", "p").as[(String, String)].collect().toMap
    assert(out("e0") == null)   // before any right row
    assert(out("e1") == "r10")  // equality is inclusive
    assert(out("e2") == "r15")  // latest preceding, not first
  }

  test("keys do not leak into each other") {
    val left = Seq((1L, 10L, "a"), (2L, 10L, "b")).toDF("k", "t", "ev")
    val right = Seq((1L, 5L, "r1")).toDF("k", "t", "p")
    val out = AsofJoin.asofJoin(left, "k", "t", right, "k", "t", Seq("p"))
      .select("ev", "p").as[(String, String)].collect().toMap
    assert(out("a") == "r1")
    assert(out("b") == null)
  }

  test("multiple payload columns carry together") {
    val left = Seq((1L, 10L, "a")).toDF("k", "t", "ev")
    val right = Seq((1L, 5L, "x", 42L)).toDF("k", "t", "p1", "p2")
    val row = AsofJoin.asofJoin(left, "k", "t", right, "k", "t", Seq("p1", "p2"))
      .select("p1", "p2").collect()(0)
    assert(row.getString(0) == "x" && row.getLong(1) == 42L)
  }
}
