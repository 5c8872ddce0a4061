package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** O(1) per-content-hash streaming state: the smallest doc_id ever
  * seen with this content — the canonical copy every later duplicate
  * points at. */
final case class KeeperState(keeper: Long)

/** Streaming front-door for the corpus pipeline: documents arrive as
  * a file stream and exit quality-gated and exact-deduped, the same
  * semantics the batch pipeline (llm_corpus_build stages 1-2, exact
  * half) applies — but incrementally, with the content-hash → keeper
  * mapping living in the state store across micro-batches. This is
  * the shape a production crawl ingest runs: per batch, cost is
  * O(batch) gate projections plus one keyed shuffle on the content
  * hash; the corpus itself is never rescanned (dd_incremental's
  * warm-index argument, running INSIDE the engine's state machinery
  * instead of a hand-carried index table).
  *
  * The quality gate here is computed entirely ROW-LOCALLY (the
  * top-bigram count via higher-order functions over the doc's own
  * bigram array) because a streaming append query admits no global
  * aggregation — semantically identical to tx_filter_pipeline's
  * groupBy formulation: max per-bigram count ≡ array_max of
  * per-distinct-bigram counts.
  */
object DocumentStream {

  def readDocuments(spark: SparkSession, dir: String): DataFrame = {
    val static = spark.read.parquet(s"$dir/documents.parquet")
    spark.readStream
      .schema(static.schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
  }

  /** (doc_id, is_novel, dup_of) for every quality-passing document:
    * novel docs carry dup_of = null, duplicates point at the smallest
    * doc_id with identical canonical content. Within a micro-batch,
    * group rows are ordered by doc_id so the output is deterministic
    * under any arrival order. */
  def corpusIngest(spark: SparkSession, dir: String): DataFrame =
    EventStream.runToTable(spark, s"st_corpus_${dir.hashCode.abs}",
      mode = "append") { ss =>
      import ss.implicits._
      import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
      val normCol = graft.functions.TextFunctions.normText(col("text"))
      // row-local top-bigram count; the outer single-element transform
      // binds the bigram array once so it is not recomputed per lambda
      val top2Expr = expr(
        """element_at(transform(array(
          |    transform(sequence(1, size(ws) - 1),
          |      i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))),
          |  bgs -> array_max(transform(array_distinct(bgs),
          |    g -> size(filter(bgs, x -> x = g))))), 1)""".stripMargin)
      val gated = readDocuments(ss, dir)
        // materialize the normalization ONCE per row — md5 and the
        // word split both consume it, and the regex chain is the
        // per-row cost that matters on a corpus scan
        .select(col("doc_id"), col("lang"),
          graft.functions.TextFunctions.stopwordHits(col("text")).as("stop_hits"),
          normCol.as("nrm"))
        .select(col("doc_id"), col("lang"), col("stop_hits"),
          md5(col("nrm")).as("h"), split(col("nrm"), " ").as("ws"))
        .withColumn("n_words", size(col("ws")))
        .withColumn("n_distinct", size(array_distinct(col("ws"))))
        .withColumn("top2", when(col("n_words") >= 2, top2Expr))
        .filter(graft.queries.Text.gatePredicate)
        .select(col("h"), col("doc_id"))
        .as[(String, Long)]
      gated.groupByKey(_._1)
        .flatMapGroupsWithState[KeeperState, (Long, Boolean, Option[Long])](
          OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
          case (_, it, state: GroupState[KeeperState]) =>
            var keeper = state.getOption.map(_.keeper).getOrElse(Long.MaxValue)
            val rows = it.map(_._2).toSeq.sorted.map { id =>
              val novel = id < keeper
              val out = (id, novel, if (novel) None else Some(keeper))
              if (novel) keeper = id
              out
            }
            state.update(KeeperState(keeper))
            rows.iterator
        }
        .toDF("doc_id", "is_novel", "dup_of")
    }
}
