package graft

import org.apache.spark.sql.functions._

/** Unit specs for the composed corpus operators (filter pipeline,
  * repetition metrics, semantic dedup) on crafted fixtures with
  * hand-computed expectations — the oracle gate checks them against
  * DuckDB on the random harness corpus; these pin the SEMANTICS on
  * inputs built to trip each gate individually. */
class ComposedOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Fixture dir with documents.parquet (+ optionally embeddings). */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_composed_fix").toString
    val good = (1 to 39).map(i => s"w$i").mkString("the ", " ", "") // 40 words, distinct, has stopword
    val spam = Seq.fill(40)("spam").mkString(" ")                   // one word 40x
    val zh = (1 to 35).map(i => s"z$i").mkString(" ")               // 35 distinct, no en stopwords
    Seq(
      (1L, good, "en", "web", good.length.toLong),
      (2L, spam, "en", "web", spam.length.toLong),
      (3L, "five short words only here", "en", "web", 26L),
      (4L, zh, "zh", "web", zh.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    // embeddings: 1,2,3 along +e1 (cos 1 pairwise, one bucket/cluster),
    // 4 along a mixed direction far from the others
    def vec(main: Int, alt: Boolean): Seq[Float] =
      (0 until 64).map { i =>
        if (!alt) { if (i == main) 1f else 0f }
        else { if (i < 32) 0.18f else -0.11f } // different sign bucket
      }
    Seq(
      (1L, vec(0, alt = false), 0),
      (2L, vec(0, alt = false), 0),
      (3L, vec(0, alt = false), 0),
      (4L, vec(0, alt = true), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("tx_repetition: exact fractions on a degenerate and a clean doc") {
    val out = SparkEntry.queries("tx_repetition")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getDouble(2), r.getDouble(3))).toMap
    // spam doc: 40 words, 1 distinct -> dup 1 - 1/40; every bigram is
    // "spam spam" -> top fraction 39/39 = 1.0
    assert(out(2L) == ((40, 1.0 - 1.0 / 40, 1.0)))
    // clean doc: all words distinct -> dup 0; all bigrams distinct ->
    // top fraction 1/39
    assert(out(1L) == ((40, 0.0, 1.0 / 39)))
  }

  test("tx_filter_pipeline: each gate trips on the doc built to trip it") {
    val out = SparkEntry.queries("tx_filter_pipeline")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4),
          r.getBoolean(5))).toMap
    assert(out(1L) == ((true, true, true, true, true)))     // keeps
    assert(out(2L) == ((true, false, false, false, false))) // repetition + no stopwords
    assert(out(3L)._1 == false)                             // too short
    assert(out(3L)._5 == false)
    assert(out(4L)._4 == true)                              // stop gate skips non-en
  }

  test("ss_semantic_dedup: transitive near-dups collapse to min-id representative") {
    val out = SparkEntry.queries("ss_semantic_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(1L) == ((1L, true)))   // representative
    assert(out(2L) == ((1L, false)))  // clustered, dropped
    assert(out(3L) == ((1L, false)))
    assert(out(4L)._2 == true)        // isolated vector keeps itself
  }

  /** Fixture for span dedup: shared, partial-tail, and in-doc-repeat
    * spans (SpanWords = 4). */
  private lazy val spanDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_span_fix").toString
    Seq(
      (1L, "a b c d e f g h", "en", "web", 15L),
      (2L, "a b c d x y z w", "en", "web", 15L), // first span dup of doc 1
      (3L, "p q r s t", "en", "web", 9L),        // partial tail span "t"
      (4L, "a b c d a b c d", "en", "web", 15L)) // both spans dup of doc 1
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("tx_dedup_spans: first occurrence wins, docs reassemble in order") {
    val out = SparkEntry.queries("tx_dedup_spans")(spark, spanDir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((2L, 0L, "a b c d e f g h")))
    assert(out(2L) == ((2L, 1L, "x y z w")))
    assert(out(3L) == ((2L, 0L, "p q r s t")))
    assert(out(4L) == ((2L, 2L, ""))) // fully boilerplate
  }

  /** Fixture for incremental dedup: batch = doc_id % 5 == 4. Exercises
    * the cross-corpus branch, the in-batch branch (absent from the
    * harness corpus), the smallest-known-id tiebreak, and novelty. */
  private lazy val incrDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_incr_fix").toString
    Seq(
      (3L, "alpha alpha alpha", "en", "web", 17L),  // existing
      (13L, "beta beta beta", "en", "web", 14L),    // existing
      (4L, "alpha alpha alpha", "en", "web", 17L),  // dup of existing 3
      (9L, "beta beta beta", "en", "web", 14L),     // dup of existing 13
      (14L, "beta beta beta", "en", "web", 14L),    // in-batch 9 < existing 13
      (19L, "gamma gamma gamma", "en", "web", 17L)) // novel
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("dd_incremental: batch dedups against corpus and its own earlier rows") {
    val out = SparkEntry.queries("dd_incremental")(spark, incrDir)
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getBoolean(2)))
      .toMap
    assert(out == Map(
      4L -> ((Some(3L), false)),   // existing corpus wins
      9L -> ((Some(13L), false)),  // existing corpus only
      14L -> ((Some(9L), false)),  // earlier in-batch id is smallest known
      19L -> ((None, true))))      // genuinely new content
  }

  /** Fixture with one violation of each DQ constraint. */
  private lazy val dqDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_dq_fix").toString
    Seq((1L, 1L), (1L, 1L), (2L, 99L)) // dup pk; custkey 99 orphaned
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    Seq((1L, Some(5.0)), (2L, None)) // one null balance
      .toDF("c_custkey", "c_acctbal")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")
    Seq((1L, 10.0), (2L, 99.0)) // one out-of-range quantity
      .toDF("l_orderkey", "l_quantity")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    d
  }

  test("an_dq_checks: every constraint detects its planted violation") {
    val out = SparkEntry.queries("an_dq_checks")(spark, dqDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out == Map(
      "orders_pk_unique" -> ((1L, false)),
      "orders_custkey_fk" -> ((1L, false)),
      "lineitem_qty_range" -> ((1L, false)),
      "customer_acctbal_not_null" -> ((1L, false))))
  }

  test("tx_split: assignment is the md5-bucket pure function of doc_id") {
    def bucket(id: Long): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      Integer.parseInt(hex.take(2), 16)
    }
    val out = SparkEntry.queries("tx_split")(spark, spanDir)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
    Seq(1L, 2L, 3L, 4L).foreach { id =>
      val b = bucket(id)
      val split = if (b < 205) "train" else if (b < 230) "val" else "test"
      assert(out(id) == ((b, split)), s"doc $id")
    }
  }
}
