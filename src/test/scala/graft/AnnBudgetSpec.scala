package graft

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Pins the DERIVED kNN-graph candidate budget (Similarity.scala,
  * `cands_within_band_budget` / `batch_cost_linear_in_batch`) on the
  * two corpus shapes that historically forced recalibration of the
  * fitted constants it replaced (512n → 2048n across rounds 12-13):
  *
  *  - a heavily DUPLICATED corpus (every vector repeated 8×) — band
  *    occupancy, and therefore genuine near-pair mass, multiplies;
  *    the budget must rise with it and the contract must stay green;
  *  - a HIGH-ENTROPY corpus (deterministic pseudo-random vectors) —
  *    the isotropic worst case where buckets are thin and the budget
  *    is smallest.
  *
  * The bound is algebraic (Σ c·(c−1) over the banding table + the
  * descent fan-out cap), so both shapes must pass with NO constant to
  * retune — that absence is what this spec pins. */
class AnnBudgetSpec extends SparkSpec {

  private val DIM = 64

  /** Writes an embeddings-shaped corpus (vec_id, float[64], label)
    * and the minimal sibling tables Tables() needs to resolve. */
  private def corpus(tag: String, vecs: DataFrame): String = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_spec_annb_$tag"
    vecs.repartition(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/embeddings.parquet")
    // Tables() reads lazily — only embeddings is touched by ss_knn_*
    // queries, but copy the tiny dims so an incidental read resolves
    Seq("region", "nation").foreach { t =>
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        .repartition(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/$t.parquet")
    }
    dir
  }

  /** Deterministic pseudo-random unit-ish vector per (id, dim) — no
    * Random so the fixture is stable across runs. */
  private def entropic(n: Int): DataFrame =
    spark.range(n.toLong).select(
      col("id").cast("long").as("vec_id"),
      expr(s"transform(sequence(0, ${DIM - 1}), d -> " +
        "CAST(sin(CAST(id * 131 + d * 17 AS DOUBLE)) AS FLOAT))").as("embedding"),
      (col("id") % 3).cast("int").as("label"))

  private def runGraph(dir: String): org.apache.spark.sql.Row =
    graft.queries.Similarity.queries("ss_knn_graph")(spark, dir).collect().head

  test("high-entropy corpus: contract green with the smallest budget") {
    val dir = corpus("entropy", entropic(400))
    val r = runGraph(dir)
    assert(r.getAs[Long]("n_nodes") == 400L)
    Seq("degree_bounded", "coverage_ok", "recall_ok", "cands_within_band_budget")
      .foreach(c => assert(r.getAs[Boolean](c), s"$c on the entropic corpus"))
  }

  test("duplicated corpus: occupancy multiplies, budget follows, no retune") {
    // 8 exact copies of each of 50 base vectors: every band bucket
    // holds ≥8 ids, so candidate volume per node is ~64× the entropic
    // corpus's — the shape that broke the fitted 512n constant
    val base = entropic(50)
    val dup = spark.range(8).crossJoin(base)
      .select((col("vec_id") * 8 + col("id")).as("vec_id"),
        col("embedding"), col("label"))
    val dir = corpus("dup", dup)
    val r = runGraph(dir)
    assert(r.getAs[Long]("n_nodes") == 400L)
    Seq("degree_bounded", "coverage_ok", "recall_ok", "cands_within_band_budget")
      .foreach(c => assert(r.getAs[Boolean](c), s"$c on the duplicated corpus"))
  }

  test("incremental build honors the derived batch budget on both shapes") {
    Seq("entropy", "dup").foreach { tag =>
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_spec_annb_$tag"
      val r = graft.queries.Similarity.queries("ss_knn_graph_incremental")(spark, dir)
        .collect().head
      assert(r.getAs[Boolean]("batch_cost_linear_in_batch"), s"budget on $tag")
      assert(r.getAs[Boolean]("degree_bounded") && r.getAs[Boolean]("coverage_ok"),
        s"graph contract on $tag")
    }
  }
}
