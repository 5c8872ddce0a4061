package graft

import org.apache.spark.sql.functions._
import graft.ml.Recommender

/** Exactness spec for the two-phase partial top-k: against a trained
  * model it must equal the brute-force full-scan ranking, bit for bit
  * (same dot-product accumulation order). */
class RecommenderSpec extends SparkSpec {
  import spark.implicits._

  private lazy val model = {
    // deterministic synthetic interactions: 60 users × 40 items
    val pairs = for {
      u <- 0 until 60; i <- 0 until 40
      if (u * 31 + i * 17) % 7 == 0
    } yield (u, i, 1.0f)
    val df = pairs.toDF("user", "item", "rating")
    new org.apache.spark.ml.recommendation.ALS()
      .setImplicitPrefs(true).setRank(8).setMaxIter(5).setSeed(42)
      .setUserCol("user").setItemCol("item").setRatingCol("rating")
      .fit(df)
  }

  test("cosineTopK equals brute-force full ranking") {
    val users = Seq(0, 7, 21).toDF("user")
    val k = 5
    val fast = Recommender.cosineTopK(model, users, k)
      .orderBy("user", "rank")
      .as[(Int, Int, Double, Int)].collect()

    // brute force on collected factors, same normalize + fold order
    def norm(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n > 0) v.map(_ / n) else v
    }
    val uf = model.userFactors.as[(Int, Seq[Float])].collect()
      .map { case (id, f) => id -> norm(f.map(_.toDouble).toArray) }.toMap
    val itf = model.itemFactors.as[(Int, Seq[Float])].collect()
      .map { case (id, f) => id -> norm(f.map(_.toDouble).toArray) }
    val expected = Seq(0, 7, 21).filter(uf.contains).flatMap { u =>
      itf.map { case (item, iv) =>
          var s = 0.0; var d = 0
          while (d < iv.length) { s += uf(u)(d) * iv(d); d += 1 }
          (u, item, s)
        }
        .sortBy { case (_, item, s) => (-s, item) }
        .take(k).zipWithIndex
        .map { case ((uu, item, s), i) => (uu, item, s, i + 1) }
    }.sortBy(r => (r._1, r._4))

    assert(fast.length == expected.length)
    fast.zip(expected).foreach { case (f, e) => assert(f == e, s"$f != $e") }
  }

  test("every requested known user gets exactly k recommendations") {
    val users = model.userFactors.select(col("id").as("user")).limit(20)
    val out = Recommender.cosineTopK(model, users, 3)
    val counts = out.groupBy("user").count().select("count").distinct().as[Long].collect()
    assert(counts.sameElements(Array(3L)))
  }
}
