package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ml.Recommender

/** Recommender surface (SURVEY.md §2.8 M1–M10). The interaction build
  * is SQL-expressible and oracle-checked; the trained-model queries
  * (ALS factors are solver-dependent) get rows-only checks, with
  * ScalaTest specs asserting their semantic invariants. */
object Reco {
  type Q = (SparkSession, String) => DataFrame

  private def sampleUsers(s: SparkSession, dir: String): DataFrame =
    Recommender.interactions(Tables(s, dir))
      .select("user").distinct().filter(col("user") % 100 === 0)

  val queries: Map[String, Q] = Map(
    "reco_interactions" -> ((s, dir) =>
      Recommender.interactions(Tables(s, dir))),
    "reco_topk_cosine" -> ((s, dir) =>
      Recommender.cosineTopK(Recommender.train(s, dir), sampleUsers(s, dir), 5)),
    "reco_topk_als" -> ((s, dir) => {
      // M4 MLlib-native path: raw inner-product ranking.
      val model = Recommender.train(s, dir)
      model.recommendForUserSubset(sampleUsers(s, dir), 5)
        .select(col("user"), posexplode(col("recommendations")))
        .select(col("user"), (col("pos") + 1).as("rank"),
          col("col.item").as("item"), col("col.rating").as("score"))
    }),
    "reco_mmr" -> ((s, dir) =>
      Recommender.diversify(Recommender.train(s, dir), sampleUsers(s, dir))),
    "reco_eval" -> ((s, dir) => Recommender.evaluate(s, dir)),
    "reco_coverage" -> ((s, dir) => Recommender.coverage(s, dir)),
    "reco_item_pca" -> ((s, dir) => Recommender.itemPca(Recommender.train(s, dir))),
    "reco_model_info" -> ((s, dir) => Recommender.modelInfo(s, dir)))

  val oracles: Map[String, String] = Map(
    // model dimensions are solver-independent: ALS emits one factor row
    // per distinct user/item in the training pairs, and rank is fixed.
    "reco_model_info" ->
      """SELECT CAST(16 AS INTEGER) AS "rank",
        |       COUNT(DISTINCT o_custkey) AS n_users,
        |       COUNT(DISTINCT l_partkey) AS n_items
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_custkey IS NOT NULL AND l_partkey IS NOT NULL""".stripMargin,
    "reco_interactions" ->
      """SELECT DISTINCT CAST(o_custkey AS INTEGER) AS "user",
        |       CAST(l_partkey AS INTEGER) AS item
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_custkey IS NOT NULL AND l_partkey IS NOT NULL""".stripMargin)
}
