package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY.md §2 + the
  * LLM-data-pipeline operators), each runnable at any scale dir;
  * `oracleSql` holds the DuckDB-equivalent SQL for every
  * SQL-expressible entry.
  */
object SparkEntry {
  type Q = (SparkSession, String) => DataFrame

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, Q] =
    graft.queries.Relational.queries ++
    graft.queries.ScaleOps.queries ++
    graft.queries.Etl.queries ++
    graft.queries.Text.queries ++
    graft.queries.DedupQueries.queries ++
    graft.queries.Similarity.queries ++
    graft.queries.Reco.queries ++
    graft.queries.Streaming.queries ++
    graft.queries.MultimodalQueries.queries ++
    graft.queries.AnalyticsQueries.queries ++
    graft.queries.Graph.queries ++
    graft.queries.Selection.queries ++
    graft.queries.Flagship.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
    graft.queries.ScaleOps.oracles ++
    graft.queries.Etl.oracles ++
    graft.queries.Text.oracles ++
    graft.queries.DedupQueries.oracles ++
    graft.queries.Similarity.oracles ++
    graft.queries.Reco.oracles ++
    graft.queries.Streaming.oracles ++
    graft.queries.MultimodalQueries.oracles ++
    graft.queries.AnalyticsQueries.oracles ++
    graft.queries.Graph.oracles ++
    graft.queries.Selection.oracles ++
    graft.queries.Flagship.oracles
}
