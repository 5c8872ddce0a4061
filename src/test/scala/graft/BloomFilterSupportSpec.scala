package graft

import org.apache.spark.sql.functions._
import graft.functions.BloomFilterSupport

/** The explicit bloom probe (BloomFilterSupport): the property the
  * whole construction rests on — no false negatives — plus the plan
  * shape (the probe is a real predicate over a scalar subquery, not a
  * degenerate always-true) and its actual pruning power. */
class BloomFilterSupportSpec extends SparkSpec {

  test("probe passes every build-side key (no false negatives)") {
    import spark.implicits._
    val build = (0 until 1000).map(i => s"key_$i").toDF("k")
    val probe = BloomFilterSupport.mightContainProbe(build, "k", col("k"), 1000L)
    assert(build.filter(probe).count() == 1000L)
  }

  test("probe prunes most non-keys at the stated sizing") {
    import spark.implicits._
    val build = (0 until 1000).map(i => s"key_$i").toDF("k")
    val others = (0 until 10000).map(i => s"other_$i").toDF("k")
    val probe = BloomFilterSupport.mightContainProbe(build, "k", col("k"), 1000L)
    val fp = others.filter(probe).count()
    // ~3% expected FP rate at the sketch's default bits-per-item;
    // 10% asserts pruning is real with wide margin
    assert(fp < 1000L, s"false-positive count $fp of 10000")
  }

  test("probe works on a derived (explode-produced) key column") {
    import spark.implicits._
    val build = Seq("a b", "c d").toDF("s")
      .select(explode(split(col("s"), " ")).as("k"))
    val data = Seq("a x", "c y", "z w").toDF("s")
      .select(explode(split(col("s"), " ")).as("k"))
    val probe = BloomFilterSupport.mightContainProbe(build, "k", col("k"), 100L)
    val kept = data.filter(probe).select("k").collect().map(_.getString(0)).toSet
    assert(kept.contains("a") && kept.contains("c"))
    // x/y/z/w may rarely false-positive, but a-d must all pass
  }

  test("executed plan carries might_contain over a scalar subquery") {
    import spark.implicits._
    val build = (0 until 100).map(i => s"k$i").toDF("k")
    val probe = BloomFilterSupport.mightContainProbe(build, "k", col("k"), 100L)
    val q = build.filter(probe)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    assert(plan.toLowerCase.contains("subquery"), plan)
  }
}
