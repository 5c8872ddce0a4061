package graft.tools
import org.apache.spark.sql.functions._
object TmpProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = graft.core.GraftSession.local("graft-prof")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // replicate charGramPairs candidate stage, inspect bucket sizes
    val n=4; val k=16; val bands=4; val r=k/bands
    val sigOf = (arr: org.apache.spark.sql.Column) => flatten(transform(
      transform(sequence(lit(0), lit(k / 4 - 1)),
        p => transform(arr, g => md5(concat(p.cast("string"), lit(":"), g)))),
      hp => transform(sequence(lit(0), lit(3)),
        s => array_min(transform(hp, h => h.substr(s * 8 + 1, lit(8)))))))
    val packed = element_at(transform(array(graft.functions.TextFunctions.normText(col("text"))), t =>
      element_at(transform(array(array_distinct(
          transform(sequence(lit(1), greatest(length(t) - (n - 1), lit(1))),
            i => t.substr(i, lit(n))))), gs =>
        struct(gs.as("grams"),
          floor(length(t) / lit(64)).cast("long").as("lb"),
          sigOf(gs).as("sig"))), lit(1))), lit(1))
    val grams = docs.repartition(64, col("doc_id")).select(col("doc_id"), packed.as("s")).persist()
      .select(col("doc_id"), col("s.lb").as("lb"), col("s.sig").as("sig"))
    val banded = grams.select(col("doc_id"), col("lb"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => md5(concat_ws("|", slice(col("sig"), b * lit(r) + 1, lit(r)))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
    val hist = banded.groupBy("band","bh","lb").agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).as("n_buckets"), max("sz").as("max_sz"),
           sum(col("sz")*(col("sz")-1)/2).as("pair_candidates"))
    hist.show(false)
    spark.stop()
  }
}
