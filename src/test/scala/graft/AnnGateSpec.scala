package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}

/** Pins BOTH paths of the ANN query-side broadcast gates
  * (Similarity.qJoin / qCross, conf `graft.ann.maxBroadcastRows`):
  * the harness query stratum is 1% of the corpus — it grows linearly
  * with scale, so past the ceiling every serving entry must switch
  * from broadcast to a shuffle-hash equi-join (bucket/cell keys) or a
  * shuffle-replicated nested loop (brute scans), with BIT-IDENTICAL
  * results. Also pins the ss_knn_ivf quantizer routing (ivfStep):
  * the oracle-exact 1/125 stride at gate scale, √n cells past
  * IvfOracleN — both strides deterministic integer arithmetic the
  * DuckDB oracle replays. The PageRankSpec dual-path precedent. */
class AnnGateSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // deterministic (oracle-exact) entries covering every gate shape:
  // brute scan (qCross), fixed-LSH probe join (qJoin, exploded probe
  // frame), filtered probe join (two-key qJoin), IVF (centroid qCross
  // + cell qJoinOn + persisted-index serve), quantized scan (qCross
  // over a derived frame)
  private val names = Seq("ss_knn_brute", "ss_knn_lsh_fixed", "ss_knn_filtered",
    "ss_knn_ivf", "ss_index_persist", "ss_knn_sq")

  private def unwrap(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
    case st: QueryStageExec => unwrap(st.plan)
    case other => other +: other.children.flatMap(unwrap)
  }

  private def run(name: String): (Seq[String], Seq[SparkPlan]) = {
    val q = graft.queries.Similarity.queries(name)(spark, dir)
    val rows = q.collect().map(_.toString).sorted.toSeq
    (rows, unwrap(q.queryExecution.executedPlan))
  }

  test("every gated entry is bit-identical across the broadcast and shuffle paths") {
    val viaBroadcast = names.map(n => n -> run(n)._1).toMap
    spark.conf.set("graft.ann.maxBroadcastRows", "0")
    try {
      names.foreach { n =>
        val (rows, ops) = run(n)
        assert(rows == viaBroadcast(n), s"$n: scale path diverged from broadcast path")
        // the scale path really left the driver out of it: no
        // broadcast join of any kind in the final adaptive plan
        val bhj = ops.count(_.isInstanceOf[BroadcastHashJoinExec])
        val bnl = ops.count(_.isInstanceOf[BroadcastNestedLoopJoinExec])
        assert(bhj == 0 && bnl == 0,
          s"$n: broadcast leaked into the scale path (bhj=$bhj bnl=$bnl)")
      }
    } finally spark.conf.unset("graft.ann.maxBroadcastRows")
  }

  test("default ceiling takes the broadcast path at gate scale") {
    // the small-probe-batch plan the gate exists to PRESERVE: at gate
    // scale the probe frame broadcasts (no shuffle of the corpus side)
    val (_, ops) = run("ss_knn_lsh_fixed")
    assert(ops.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "gate-scale LSH probe join lost its broadcast")
  }

  test("ivfStep: oracle stride at gate scale, √n cells past IvfOracleN") {
    import graft.queries.Similarity.{ivfStep, IvfOracleN}
    assert(ivfStep(0L) == 125L)
    assert(ivfStep(60000L) == 125L)
    assert(ivfStep(IvfOracleN) == 125L)
    // just past the bound: stride = n / ceil(√n) — cell count ≈ √n,
    // so assignment is Θ(n^1.5), not Θ(n²/125)
    val n1 = IvfOracleN + 1
    val cells1 = n1 / ivfStep(n1)
    assert(ivfStep(n1) != 125L)
    assert(math.abs(cells1 - math.sqrt(n1.toDouble)) <= math.sqrt(n1.toDouble) * 0.1,
      s"cells=$cells1 for n=$n1")
    // at 10⁹ vectors the centroid table is ~√n ≈ 31.6k rows — well
    // under the broadcast ceiling, which is the point of the routing
    val nBig = 1000000000L
    assert(nBig / ivfStep(nBig) <= 40000L)
  }

  test("CountMemo: onMissing distinguishes a provably-absent table from " +
      "a transient error, and is never cached") {
    // the shared gate memo (ANN embeddings gate, item-item kernel
    // gate): missing table → onMissing without running compute;
    // compute failure on an EXISTING path → onError, not memoized;
    // a table created later is seen on the next call
    val memo = new graft.core.GraftSession.CountMemo(
      onError = Long.MaxValue, onMissing = -1L)
    val tmp = java.nio.file.Files.createTempDirectory("graft_memo").toString
    val path = s"$tmp/t.parquet"
    var computed = 0
    assert(memo(spark, path) { computed += 1; 7L } == -1L)
    assert(computed == 0, "compute must not run for a missing table")
    // existing path, failing compute → onError for this call only
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    assert(memo(spark, path) { sys.error("transient") } == Long.MaxValue)
    // same (now-existing) path, good compute → memoized value
    assert(memo(spark, path) { computed += 1; 7L } == 7L)
    assert(memo(spark, path) { computed += 1; 99L } == 7L)
    assert(computed == 1, "successful count must memoize")
  }
}
