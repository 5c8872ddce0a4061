package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.functions.VectorFunctions._

/** Similarity search over the `embeddings` table (64-dim float
  * vectors): brute-force cosine top-k as the exactness baseline, a
  * sign-LSH bucketed ANN as the scale path, and embedding-cosine
  * near-dup pairs.
  *
  * Scale shape: the brute-force variant broadcasts the (tiny) query
  * set against the corpus — linear scan, embarrassingly parallel, the
  * right baseline up to ~10^7 corpus rows per executor-batch. The LSH
  * variant replaces the scan with an equi-join on a 6-bit hyperplane
  * sign bucket (one shuffle), which is the 100 TB path; recall is
  * tunable via nPlanes / multi-probe. */
object Similarity {
  type Q = (SparkSession, String) => DataFrame

  private val DIM = 64
  private val PLANES = 6
  private val K = 5
  private val NPROBE = 2

  val queries: Map[String, Q] = Map(
    // exact cosine top-k: query set = every 100th vector.
    "ss_knn_brute" -> ((s, dir) => {
      val e = Tables(s, dir).embeddings
      val q = e.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("vec_id"))
      e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          expr(cosineSql("qe", "embedding", DIM)).as("cosine"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= K)
    }),
    // ANN: candidates share the 6-plane sign bucket; top-k within.
    "ss_knn_lsh" -> ((s, dir) => {
      val e = Tables(s, dir).embeddings
        .withColumn("bucket", expr(signBucketSql("embedding", DIM, PLANES)))
      val q = e.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("bucket"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("vec_id"))
      e.join(broadcast(q), Seq("bucket"))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          expr(cosineSql("qe", "embedding", DIM)).as("cosine"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= K)
    }),
    // IVF ANN: coarse-quantize the corpus to inverted cells (one
    // linear broadcast-assignment pass), probe the nprobe=2 nearest
    // cells per query. Centroids here are a deterministic 1/125
    // subset so the oracle can replicate the index exactly; at
    // warehouse scale the centroid set comes from KMeans.fit and the
    // assignment pass is unchanged (corpus never shuffles — cells are
    // a projection, search is one equi-join on cell id).
    "ss_knn_ivf" -> ((s, dir) => {
      val e = Tables(s, dir).embeddings
      val cents = e.filter(col("vec_id") % 125 === 0)
        .select(col("vec_id").as("cid"), col("embedding").as("ce"))
      val wa = Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cid"))
      val assigned = e.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("embedding"), col("cid"),
          expr(cosineSql("embedding", "ce", DIM)).as("csim"))
        .withColumn("arn", row_number().over(wa)).filter(col("arn") === 1)
        .select("vec_id", "embedding", "cid")
      val wq = Window.partitionBy(col("qid")).orderBy(col("qsim").desc, col("cid"))
      val probes = e.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        .crossJoin(broadcast(cents))
        .select(col("qid"), col("qe"), col("cid"),
          expr(cosineSql("qe", "ce", DIM)).as("qsim"))
        .withColumn("qrn", row_number().over(wq)).filter(col("qrn") <= NPROBE)
        .select("qid", "qe", "cid")
      val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("vec_id"))
      assigned.join(broadcast(probes), Seq("cid"))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          expr(cosineSql("qe", "embedding", DIM)).as("cosine"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= K)
    }),
    // scalar-quantized (int8) ANN: compress every float to an 8-bit
    // code against the global [min, max] range — 4x less memory and
    // bandwidth per vector, the standard first compression step before
    // IVF/PQ at corpus scale. Ranking runs entirely on the quantized
    // codes; scores are integer dot products (exact in double whatever
    // the accumulation order), so unlike float-sum ANN this variant is
    // bit-identical across engines BY CONSTRUCTION, and the oracle
    // checks it exactly.
    "ss_knn_sq" -> ((s, dir) => {
      val e = Tables(s, dir).embeddings
      val stats = e.agg(
        min(expr("array_min(embedding)")).cast("double").as("mn"),
        max(expr("array_max(embedding)")).cast("double").as("mx"))
      val quant = "transform(embedding, x -> CAST(least(255, " +
        "floor((CAST(x AS DOUBLE) - mn) / (mx - mn) * 256.0)) AS DOUBLE))"
      val eq = e.crossJoin(broadcast(stats))
        .select(col("vec_id"), expr(quant).as("qv"))
      val q = eq.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("qid"), col("qv").as("qq"))
      val w = Window.partitionBy(col("qid")).orderBy(col("qcos").desc, col("vec_id"))
      eq.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          expr(cosineSql("qq", "qv", DIM)).as("qcos"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= K)
    }),
    // embedding-cosine near-dup pairs within LSH buckets.
    "ss_embed_neardup" -> ((s, dir) => {
      val e = Tables(s, dir).embeddings
        .withColumn("bucket", expr(signBucketSql("embedding", DIM, PLANES)))
      val a = e.select(col("vec_id").as("id_a"), col("embedding").as("e_a"), col("bucket"))
      val b = e.select(col("vec_id").as("id_b"), col("embedding").as("e_b"), col("bucket"))
      a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          expr(cosineSql("e_a", "e_b", DIM)).as("cosine"))
        .filter(col("cosine") >= 0.3)
    }))

  val oracles: Map[String, String] = Map(
    "ss_knn_brute" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe
         |           FROM embeddings WHERE vec_id % 100 = 0),
         |scored AS (
         |  SELECT q.qid, e.vec_id,
         |         ${cosineDuck("qe", "embedding", DIM)} AS cosine
         |  FROM embeddings e CROSS JOIN q
         |  WHERE e.vec_id <> q.qid)
         |SELECT qid, vec_id, cosine, rank FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rank
         |  FROM scored)
         |WHERE rank <= $K""".stripMargin,
    "ss_knn_lsh" ->
      s"""WITH e AS (SELECT vec_id, embedding,
         |                  ${signBucketDuck("embedding", DIM, PLANES)} AS bucket
         |           FROM embeddings),
         |q AS (SELECT vec_id AS qid, embedding AS qe, bucket
         |      FROM e WHERE vec_id % 100 = 0),
         |scored AS (
         |  SELECT q.qid, e.vec_id,
         |         ${cosineDuck("qe", "embedding", DIM)} AS cosine
         |  FROM e JOIN q USING (bucket)
         |  WHERE e.vec_id <> q.qid)
         |SELECT qid, vec_id, cosine, rank FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rank
         |  FROM scored)
         |WHERE rank <= $K""".stripMargin,
    "ss_knn_ivf" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id % 125 = 0),
         |assigned AS (
         |  SELECT vec_id, embedding, cid FROM (
         |    SELECT e.vec_id, e.embedding, c.cid,
         |           ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${cosineDuck("e.embedding", "c.ce", DIM)} DESC, c.cid) AS arn
         |    FROM embeddings e CROSS JOIN cents c)
         |  WHERE arn = 1),
         |probes AS (
         |  SELECT qid, qe, cid FROM (
         |    SELECT q.vec_id AS qid, q.embedding AS qe, c.cid,
         |           ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |             ORDER BY ${cosineDuck("q.embedding", "c.ce", DIM)} DESC, c.cid) AS qrn
         |    FROM embeddings q CROSS JOIN cents c WHERE q.vec_id % 100 = 0)
         |  WHERE qrn <= $NPROBE),
         |scored AS (
         |  SELECT p.qid, a.vec_id,
         |         ${cosineDuck("p.qe", "a.embedding", DIM)} AS cosine
         |  FROM assigned a JOIN probes p USING (cid)
         |  WHERE a.vec_id <> p.qid)
         |SELECT qid, vec_id, cosine, rank FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rank
         |  FROM scored)
         |WHERE rank <= $K""".stripMargin,
    "ss_knn_sq" ->
      s"""WITH st AS (SELECT CAST(MIN(list_min(embedding)) AS DOUBLE) AS mn,
         |                   CAST(MAX(list_max(embedding)) AS DOUBLE) AS mx
         |            FROM embeddings),
         |eq AS (SELECT vec_id,
         |              list_transform(embedding, x -> CAST(least(255,
         |                floor((CAST(x AS DOUBLE) - mn) / (mx - mn) * 256.0)) AS DOUBLE)) AS qv
         |       FROM embeddings CROSS JOIN st),
         |q AS (SELECT vec_id AS qid, qv AS qq FROM eq WHERE vec_id % 100 = 0),
         |scored AS (
         |  SELECT q.qid, e.vec_id,
         |         ${cosineDuck("qq", "qv", DIM)} AS qcos
         |  FROM eq e CROSS JOIN q
         |  WHERE e.vec_id <> q.qid)
         |SELECT qid, vec_id, qcos, rank FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY qcos DESC, vec_id) AS rank
         |  FROM scored)
         |WHERE rank <= $K""".stripMargin,
    "ss_embed_neardup" ->
      s"""WITH e AS (SELECT vec_id, embedding,
         |                  ${signBucketDuck("embedding", DIM, PLANES)} AS bucket
         |           FROM embeddings)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |       ${cosineDuck("a.embedding", "b.embedding", DIM)} AS cosine
         |FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |WHERE ${cosineDuck("a.embedding", "b.embedding", DIM)} >= 0.3""".stripMargin)
}
