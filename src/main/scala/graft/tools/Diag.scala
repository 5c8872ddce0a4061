package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway diagnostics for scale investigations (not part of the
  * library surface). */
object Diag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val spark = graft.core.GraftSession.local("graft-diag")
    val sig = graft.multimodal.Multimodal.mediaTable(
        graft.core.Tables(spark, dir).documents)
      .filter(col("kind") === "image")
      .withColumn("phash",
        graft.multimodal.Multimodal.codec.phash(col("payload"), col("media_id")))
      .select(col("media_id"), col("phash"))
    val banded = sig.select(col("media_id"), col("phash"),
        explode(expr("array(0, 1, 2, 3)")).as("band_idx"))
      .withColumn("band_val",
        expr("shiftrightunsigned(phash, 15 * band_idx) & 32767"))
    val buckets = banded.groupBy("band_idx", "band_val")
      .agg(count(lit(1)).as("n"))
    buckets.agg(count(lit(1)).as("n_buckets"), max("n").as("max_bucket"),
        sum(col("n") * (col("n") - 1) / 2).as("cand_pairs")).show(false)
    buckets.orderBy(col("n").desc).show(5, false)
    // exact-phash multiplicity: if thousands share one hash, the TRUE
    // hamming<=2 output is quadratic and no candidate scheme saves it
    val groups = sig.groupBy("phash").agg(count(lit(1)).as("n"))
    groups.agg(count(lit(1)).as("n_distinct_phash"), max("n").as("max_mult"),
      sum(col("n") * (col("n") - 1) / 2).as("exact_pairs")).show(false)
    // 3 x 21-bit banding candidate volume (recall still guaranteed for
    // hamming<=2: two differing bits leave >=1 of 3 bands intact)
    val banded3 = sig.select(col("phash"),
        explode(expr("array(0, 1, 2)")).as("b"))
      .withColumn("v", expr("shiftrightunsigned(phash, 21 * b) & 2097151"))
    banded3.groupBy("b", "v").agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_buckets21"), max("n").as("max_bucket21"),
        sum(col("n") * (col("n") - 1) / 2).as("cand_pairs21")).show(false)
    spark.stop()
  }
}
