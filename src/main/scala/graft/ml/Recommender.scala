package graft.ml

import org.apache.spark.ml.recommendation.{ALS, ALSModel}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import scala.collection.concurrent.TrieMap
import graft.core.Tables

/** Collaborative-filtering recommender (SURVEY.md §2.8 M1–M10).
  *
  * The reference trains a hand-rolled SGD matrix factorization over
  * implicit (customer, product) pairs (mf_knn_recommender.py:98-173);
  * we use MLlib ALS with implicitPrefs — same regularized implicit-MF
  * objective family, distributed solver (SURVEY.md §7.3). Ranking
  * semantics (cosine scoring over L2-normalized factors,
  * mf_knn_recommender.py:256-269) and the MMR diversifier / evaluator
  * are reproduced exactly.
  *
  * Scale shape: ALS's block-partitioned factor updates are the
  * standard 100 TB-capable implicit-MF solver; cosine top-k broadcasts
  * the (small) query-user factor block against the item factors —
  * item factors are rank×nItems, orders of magnitude smaller than the
  * interaction data, so the scan parallelizes trivially. Nothing here
  * collects interaction-scale data to the driver.
  */
object Recommender {

  val Rank = 16

  /** M1: implicit interaction pairs — distinct (customer, part) from
    * the order↔lineitem join (the fact table's recommender projection,
    * mf_knn_recommender.py:54-58: clean → project → dedup). */
  def interactions(t: Tables): DataFrame =
    t.orders
      .join(t.lineitem, t.orders("o_orderkey") === t.lineitem("l_orderkey"))
      .select(col("o_custkey").cast("int").as("user"),
        col("l_partkey").cast("int").as("item"))
      .na.drop()
      .distinct()

  // one trained model per sf dir per JVM — the reco_* queries share it.
  private val cache = TrieMap[String, ALSModel]()

  // ALS rejects an empty ratings frame outright, and an empty slice is
  // a routine production input (a tenant with no orders yet, a fully
  // filtered backfill window) — the model-backed operators answer it
  // with an empty result instead of a solver crash. Only the TRUE
  // (non-empty) verdict is memoized — mirroring the model cache, which
  // only ever caches a successful fit: a dir probed while empty must
  // not keep answering "empty" after data lands in it.
  private val nonEmptyCache = TrieMap[String, Boolean]()
  def hasInteractions(spark: SparkSession, dir: String): Boolean =
    nonEmptyCache.get(dir).getOrElse {
      val nonEmpty = !interactions(Tables(spark, dir)).isEmpty
      if (nonEmpty) nonEmptyCache.put(dir, true)
      nonEmpty
    }

  /** Empty frame with the given DDL schema — the shape of a
    * model-backed result when there is no data to train on. */
  def emptyOf(spark: SparkSession, ddl: String): DataFrame =
    spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(ddl))

  /** M2: ALS implicit-MF, seeded (mf_knn_recommender.py:23 defaults →
    * rank/reg; ALS maxIter replaces SGD epochs). */
  def train(spark: SparkSession, dir: String): ALSModel =
    cache.getOrElseUpdate(dir, {
      val inter = interactions(Tables(spark, dir)).withColumn("rating", lit(1.0f))
      als(blocksFor(spark, dir)).fit(inter)
    })

  /** ALS factor-block count sized to the RATING volume, proxied by the
    * memoized parquet-metadata lineitem count (ratings ≈ distinct
    * fact pairs; the proxy is metadata-cheap and scale-proportional).
    * Measured: at ~500k ratings 2-4 blocks ≈ 12 s vs 10 blocks 14 s —
    * per-iteration shuffle overhead beats extra parallelism when
    * blocks are small; but the solver's parallelism is user-blocks ×
    * item-blocks TASKS, so a fixed 4 caps a 60M-rating fit (the 100×
    * rehearsal) at 16 tasks on 32 cores — ALS trained 35 min there.
    * ~1.5M fact rows per block is the measured crossover grain; the
    * upper clamp is the core count here, executor count on a real
    * cluster. A failed probe sizes to the floor (small fits tolerate
    * few blocks; the env override covers operational emergencies). */
  private val liCounts = new graft.core.GraftSession.CountMemo(onError = -1L)
  private def blocksFor(spark: SparkSession, dir: String): Int = {
    val n = liCounts(spark, s"$dir/lineitem.parquet")(
      Tables(spark, dir).lineitem.count())
    math.min(32L, math.max(4L, n / 1500000L)).toInt
  }

  /** ALS configured for the harness scale: block count from
    * `blocksFor` (data-sized, env-overridable) and 5 iterations
    * (implicit ALS converges in a handful of sweeps; the reference's
    * 200-500 SGD epochs are a solver artifact). */
  private def als(blocks: Int) = new ALS()
    .setImplicitPrefs(true)
    .setRank(Rank)
    .setRegParam(0.01)
    .setMaxIter(5)
    .setSeed(42)
    .setNumBlocks(sys.env.get("GRAFT_ALS_BLOCKS").map(_.toInt).getOrElse(blocks))
    .setUserCol("user").setItemCol("item").setRatingCol("rating")
    .setColdStartStrategy("drop")

  // native codegen'd dot product (GraftExtensions); same left-fold
  // accumulation order as the aggregate-HOF formulation, so swapping
  // it in is bit-invisible to results.
  private def dotExpr(a: String, b: String): String = s"vec_dot($a, $b)"

  /** L2-normalize a factor array (zero vectors pass through unscaled —
    * mf_knn_recommender.py:489-499). Output: array<double> `nf`. */
  private def normalize(factors: DataFrame): DataFrame =
    factors
      .withColumn("_d", expr("transform(features, x -> CAST(x AS DOUBLE))"))
      .withColumn("_n", sqrt(expr(dotExpr("_d", "_d"))))
      .withColumn("nf", when(col("_n") > 0,
        expr("transform(_d, x -> x / _n)")).otherwise(col("_d")))
      .select(col("id"), col("nf"))

  /** M3/M4: cosine top-k for a set of users. Two-phase partial top-k:
    * the (small) query-user factor block is broadcast, each item
    * partition keeps a bounded per-user heap (the ranking analog of a
    * map-side combine), and only users×k×partitions survivor rows meet
    * the final per-user selection — the full users×items score matrix
    * is never shuffled or sorted. */
  /** Query-user block ceiling for cosineTopK: above this, the
    * broadcast block stops being "small" and the MLlib blocked path
    * (`recommendForAllUsers`) is the right tool. Guarded explicitly so
    * the serve-path collect can never silently become a driver OOM. */
  val MaxQueryUsers = 100000

  def cosineTopK(model: ALSModel, users: DataFrame, k: Int): DataFrame = {
    val spark = model.userFactors.sparkSession
    import spark.implicits._
    val uvecs: Array[(Int, Array[Double])] = normalize(model.userFactors)
      .join(users.select(col("user").cast("int").as("id")), "id")
      .as[(Int, Seq[Double])].collect().map { case (u, v) => (u, v.toArray) }
    require(uvecs.length <= MaxQueryUsers,
      s"cosineTopK serves bounded query sets (got ${uvecs.length} users, " +
        s"max $MaxQueryUsers); use ALSModel.recommendForAllUsers for full-catalog batch")
    val bc = spark.sparkContext.broadcast(uvecs)
    val partials = normalize(model.itemFactors)
      .select(col("id").as("item"), col("nf"))
      .as[(Int, Seq[Double])]
      .mapPartitions { it =>
        val us = bc.value
        val nU = us.length
        val rank = if (nU == 0) 0 else us(0)._2.length
        // the user block as ONE flat primitive matrix: the inner loop
        // below runs O(queryUsers × items) times per partition — at
        // the 100× rehearsal that was 3×10¹⁰ iterations, and indexing
        // a Map[user → heap] PER ITERATION (the original shape) spent
        // more time hashing than multiplying (measured 22 min of pure
        // serving at sf10). Heaps index by position; the flat matrix
        // keeps the dot-product walk sequential in memory. Summation
        // order per dot product is unchanged, so scores — and the
        // oracle hash — are bit-identical.
        val uflat = new Array[Double](nU * rank)
        var i = 0
        while (i < nU) {
          System.arraycopy(us(i)._2, 0, uflat, i * rank, rank); i += 1
        }
        // per-user bounded heap ordered worst-first: (score asc, item desc)
        val ord = Ordering.by[(Int, Double), (Double, Int)] { case (item, s) => (-s, item) }
        val heaps = Array.fill(nU)(
          new scala.collection.mutable.PriorityQueue[(Int, Double)]()(ord))
        it.foreach { case (item, nfSeq) =>
          val nf = nfSeq.toArray
          var ui = 0
          var off = 0
          while (ui < nU) {
            var s = 0.0; var d = 0
            while (d < rank) { s += uflat(off + d) * nf(d); d += 1 }
            val h = heaps(ui)
            if (h.size < k) h.enqueue((item, s))
            else {
              val (wItem, wScore) = h.head
              if (s > wScore || (s == wScore && item < wItem)) {
                h.dequeue(); h.enqueue((item, s))
              }
            }
            ui += 1
            off += rank
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, ui) =>
          h.iterator.map { case (item, s) => (us(ui)._1, item, s) }
        }
      }
    // final exact selection over users × k × partitions survivor rows
    val w = Window.partitionBy(col("user")).orderBy(col("score").desc, col("item"))
    partials.toDF("user", "item", "score")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** M6: Maximal-Marginal-Relevance diversification, exactly the
    * reference's greedy loop (mf_knn_recommender.py:477-547): pool =
    * top 3k by cosine relevance, first pick = argmax relevance, then
    * argmax of λ·rel − (1−λ)·maxSimToSelected; ties break on first
    * occurrence in relevance order (np.argmax semantics). Runs
    * distributed: one group per user via mapGroups. */
  def mmrSelect(cands: Seq[(Int, Double, Array[Double])], k: Int, lambda: Double)
      : Seq[(Int, Double)] = {
    if (cands.isEmpty || k <= 0) return Nil
    val rel = cands.map(_._2).toArray
    val vecs = cands.map(_._3).toArray
    def sim(i: Int, j: Int): Double = {
      var s = 0.0; var d = 0
      while (d < vecs(i).length) { s += vecs(i)(d) * vecs(j)(d); d += 1 }
      s
    }
    val selected = scala.collection.mutable.ArrayBuffer[Int]()
    val remaining = scala.collection.mutable.ArrayBuffer.range(0, cands.length)
    // first: argmax relevance (candidates arrive relevance-sorted, but
    // recompute to be order-independent)
    val first = remaining.indices.maxBy(i => (rel(remaining(i)), -remaining(i)))
    selected += remaining.remove(first)
    while (selected.length < k && remaining.nonEmpty) {
      val scores = remaining.map { c =>
        lambda * rel(c) - (1 - lambda) * selected.map(s => sim(c, s)).max
      }
      // np.argmax: first index of the max
      val best = scores.indices.maxBy(i => (scores(i), -i))
      selected += remaining.remove(best)
    }
    selected.map(i => (cands(i)._1, rel(i))).toSeq
  }

  /** MMR over a user set: top-3k cosine candidates per user, joined to
    * their normalized factors, diversified per group. */
  def diversify(model: ALSModel, users: DataFrame, k: Int = 5,
                lambda: Double = 0.5): DataFrame = {
    val spark = users.sparkSession
    import spark.implicits._
    val pool = cosineTopK(model, users, k * 3)
    val itf = normalize(model.itemFactors)
      .select(col("id").as("item"), col("nf"))
    val withVecs = pool.join(itf, "item")
      .select(col("user"), col("item"), col("score"), col("nf"))
      .as[(Int, Int, Double, Seq[Double])]
    withVecs.groupByKey(_._1)
      .flatMapGroups { (user, it) =>
        val cands = it.toSeq.sortBy(c => (-c._3, c._2))
          .map(c => (c._2, c._3, c._4.toArray))
        mmrSelect(cands, k, lambda).zipWithIndex.map {
          case ((item, rel), i) => (user, item, rel, i + 1)
        }
      }
      .toDF("user", "item", "score", "rank")
  }

  /** M7: ranking evaluation with the reference's exact (nonstandard)
    * semantics (mf_knn_recommender.py:365-448): precision divides by
    * fixed k; recall by |actual|; users with empty recs or actual are
    * skipped; F1 computed from the *averaged* P and R. Split is a
    * deterministic 80/20 hash holdout. */
  // the 80%-holdout model is deterministic per dir (seeded ALS on a
  // hash split) — cache it like the full model so repeated evaluation
  // calls don't re-train.
  private val evalCache = TrieMap[String, ALSModel]()

  def evaluate(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    if (!hasInteractions(spark, dir))
      return emptyOf(spark,
        "precision double, recall double, f1_score double, num_evaluated_users bigint")
    // engine-independent 80/20 holdout: fold = first md5 hex digit of
    // "user:item" mod 5 (NOT Spark's murmur hash — md5 is computable
    // bit-for-bit by any engine, so the holdout population and hence
    // num_evaluated_users are oracle-verifiable facts, not
    // implementation accidents).
    val inter = interactions(Tables(spark, dir))
      .withColumn("_h",
        md5(concat(col("user").cast("string"), lit(":"), col("item").cast("string"))))
      .withColumn("_fold",
        (expr("instr('0123456789abcdef', substr(_h, 1, 1))") - lit(1)) % 5)
    val fold = col("_fold")
    val train = inter.filter(fold =!= 0).select("user", "item")
    val test = inter.filter(fold === 0).select("user", "item")
    // a tiny-but-nonempty interaction set can still leave the 80%
    // training fold empty (every row hashed into fold 0) — no model
    // is fittable, so no users are evaluable
    if (!evalCache.contains(dir) && train.isEmpty)
      return emptyOf(spark,
        "precision double, recall double, f1_score double, num_evaluated_users bigint")
    val model = evalCache.getOrElseUpdate(dir,
      als(blocksFor(spark, dir)).fit(train.withColumn("rating", lit(1.0f))))
    // common users, deterministically capped at 1000 (reference samples)
    val evalUsers = test.select("user").distinct()
      .join(train.select("user").distinct(), "user", "left_semi")
      .orderBy("user").limit(1000)
    val recs = cosineTopK(model, evalUsers, k)
      .groupBy("user").agg(collect_set(col("item")).as("recs"))
    val actual = test.join(evalUsers, "user")
      .groupBy("user").agg(collect_set(col("item")).as("actual"))
    val perUser = recs.join(actual, "user")
      .filter(size(col("recs")) > 0 && size(col("actual")) > 0)
      .select(
        (size(array_intersect(col("recs"), col("actual"))).cast("double") / k)
          .as("precision"),
        (size(array_intersect(col("recs"), col("actual"))).cast("double") /
          size(col("actual"))).as("recall"))
    perUser.agg(
        avg(col("precision")).as("precision"),
        avg(col("recall")).as("recall"),
        count(lit(1)).as("num_evaluated_users"))
      .withColumn("f1_score",
        when(col("precision") + col("recall") > 0,
          lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall"))).otherwise(0.0))
      .select("precision", "recall", "f1_score", "num_evaluated_users")
  }

  /** M8: catalog coverage — |distinct recommended over a sample| /
    * |all trained items| (mf_knn_recommender.py:450-475; deterministic
    * first-100-users sample replaces the seeded shuffle). */
  def coverage(spark: SparkSession, dir: String, k: Int = 5,
               sampleSize: Int = 100): DataFrame = {
    if (!hasInteractions(spark, dir))
      return emptyOf(spark,
        "items_recommended bigint, items_total bigint, coverage double")
    val model = train(spark, dir)
    val users = model.userFactors.select(col("id").as("user"))
      .orderBy("user").limit(sampleSize)
    val recommended = cosineTopK(model, users, k)
      .select("item").distinct().count()
    val total = model.itemFactors.count()
    import spark.implicits._
    Seq((recommended, total, recommended.toDouble / total))
      .toDF("items_recommended", "items_total", "coverage")
  }

  /** M9: PCA(2) projection of the item factors (the reference's
    * embedding plot, minus matplotlib — we emit the coordinates). */
  def itemPca(model: ALSModel): DataFrame = {
    import org.apache.spark.ml.feature.PCA
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    val feats = model.itemFactors
      .select(col("id").as("item"), array_to_vector(col("features")).as("fv"))
    val pca = new PCA().setInputCol("fv").setOutputCol("pc").setK(2).fit(feats)
    pca.transform(feats)
      .withColumn("pc_arr", vector_to_array(col("pc")))
      .select(col("item"),
        col("pc_arr").getItem(0).as("x"),
        col("pc_arr").getItem(1).as("y"))
  }

  /** M10: model persistence round-trip + get_model_info equivalent. */
  def modelInfo(spark: SparkSession, dir: String): DataFrame = {
    if (!hasInteractions(spark, dir))
      return emptyOf(spark, "rank int, n_users bigint, n_items bigint")
    val model = train(spark, dir)
    // app+dir-scoped scratch (NOT a fixed path): two concurrent
    // sessions saving/loading at one fixed location clobber each
    // other's model dirs mid-round-trip — the etl_pipeline hazard,
    // pinned here by ConcurrencySpec's dual-session modelInfo case
    val path = graft.core.GraftSession.scratchDir(spark, "als_model", dir)
    model.write.overwrite().save(path)
    val loaded = ALSModel.load(path)
    import spark.implicits._
    Seq((loaded.rank, loaded.userFactors.count(), loaded.itemFactors.count()))
      .toDF("rank", "n_users", "n_items")
  }
}
