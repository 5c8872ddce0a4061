package graft

/** End-to-end semantics of llm_corpus_build on a fixture where every
  * stage has exactly one doc built to trip it: a spam doc (quality
  * gate), an exact-duplicate pair (dedup), and a prefix-copy of an
  * eval doc (decontamination — high containment but sub-0.5 Jaccard,
  * so ONLY the overlap gate can catch it). The oracle gate checks the
  * same query against DuckDB on the random harness corpus; this pins
  * which stage dropped which doc. */
class FlagshipSpec extends SparkSpec {
  import spark.implicits._

  private def uniqueDoc(tag: String, n: Int): String =
    (1 until n).map(i => s"${tag}$i").mkString("the ", " ", "")

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_flagship_fix").toString
    val evalLong = uniqueDoc("e", 80)                       // odd: eval doc
    val prefixCopy = evalLong.split(" ").take(35).mkString(" ") // even: 100% containment, Jaccard 33/78 < 0.5
    val spam = Seq.fill(40)("spam").mkString(" ")
    Seq(
      (1L, evalLong,          "en", "web"),
      (2L, uniqueDoc("a", 40), "en", "web"),   // survives all stages
      (3L, uniqueDoc("b", 40), "en", "web"),   // survives, but odd → eval side
      (4L, uniqueDoc("c", 40), "en", "web"),   // exact-dup rep, survives
      (6L, uniqueDoc("c", 40), "en", "web"),   // exact dup of 4 → dropped
      (8L, prefixCopy,         "en", "web"),   // contaminated → dropped
      (10L, spam,              "en", "web"))   // quality-gated → dropped
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("llm_corpus_build: each stage drops its doc; pack is exact") {
    val out = SparkEntry.queries("llm_corpus_build")(spark, dir)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      (2L, "en", "web", 40L, 0L, 0L, 0L),
      (4L, "en", "web", 40L, 40L, 0L, 40L)))
  }

  test("llm_corpus_audit: every doc names the stage that dropped it") {
    val stages = SparkEntry.queries("llm_corpus_audit")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(stages == Map(
      1L -> "eval_holdout",   // survives dedup, but odd → eval side
      2L -> "kept",
      3L -> "eval_holdout",
      4L -> "kept",           // exact-dup representative
      6L -> "exact_dup",      // non-representative copy of 4
      8L -> "contaminated",   // prefix copy of eval doc 1
      10L -> "quality"))      // spam
  }
}
