package graft

import org.apache.spark.sql.functions._

/** CharNgrams (the one-pass sliding-window gram generator): output
  * arrays byte-identical to the transform/substr HOF form it replaced
  * (including the short-string and empty-string edges and multi-byte
  * code points), null propagation, and SQL-surface registration. */
class CharNgramsSpec extends SparkSpec {
  import spark.implicits._

  /** The round-16 formulation the expression must match exactly. */
  private def hofForm(n: Int): String =
    s"transform(sequence(1, greatest(length(t) - ${n - 1}, 1)), i -> substr(t, i, $n))"

  test("windows match the HOF form on randomized strings (ascii + multibyte)") {
    val rnd = new scala.util.Random(42)
    // alphabet mixes 1-, 2-, 3- and 4-byte UTF-8 code points so the
    // offset walk is exercised across widths (the HOF's substr counts
    // code points, and so must we)
    val alphabet = "ab z09.éß€日本語🙂"
    val docs = (1 to 200).map { i =>
      val len = rnd.nextInt(50)
      (i, (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    for (n <- Seq(3, 4)) {
      val df = docs.toDF("id", "t")
        .select(col("id"), expr(s"char_ngrams(t, $n)").as("fast"),
          expr(hofForm(n)).as("ref"))
      val bad = df.filter(not(col("fast") <=> col("ref"))).collect()
      assert(bad.isEmpty, s"n=$n mismatches: ${bad.take(3).mkString(";")}")
    }
  }

  test("short-string edge: fewer than n chars yields one whole-string element") {
    val rows = spark.sql(
      """SELECT char_ngrams('', 3) AS a, char_ngrams('x', 3) AS b,
        |       char_ngrams('xy', 3) AS c, char_ngrams('xyz', 3) AS d,
        |       char_ngrams('wxyz', 3) AS e""".stripMargin).first()
    assert(rows.getSeq[String](0) == Seq(""))
    assert(rows.getSeq[String](1) == Seq("x"))
    assert(rows.getSeq[String](2) == Seq("xy"))
    assert(rows.getSeq[String](3) == Seq("xyz"))
    assert(rows.getSeq[String](4) == Seq("wxy", "xyz"))
  }

  test("null input propagates; non-literal n is rejected") {
    val r = spark.sql("SELECT char_ngrams(CAST(NULL AS STRING), 3) AS a").first()
    assert(r.isNullAt(0))
    // foldable-but-not-literal n is fine (constant-folds to 3); a
    // genuinely non-foldable n (a column) must be rejected
    assert(spark.sql("SELECT char_ngrams('abcd', length('ab') + 1) AS g")
      .first().getSeq[String](0) == Seq("abc", "bcd"))
    val e = intercept[Exception] {
      Seq(3).toDF("n").selectExpr("char_ngrams('abc', n)").collect()
    }
    assert(e.getMessage.contains("literal"), e.getMessage)
  }

  test("grouped counts over char_ngrams equal counts over the HOF form") {
    // the property every caller actually consumes: identical multisets
    val docs = Seq((1L, "the cat sat on the mat"), (2L, "日本語 text mixed"),
      (3L, ""), (4L, "aaaa")).toDF("doc_id", "t")
    def counts(gram: String) = docs
      .select(explode(expr(gram)).as("g")).groupBy("g").count()
      .orderBy("g").collect().toSeq
    assert(counts("char_ngrams(t, 3)") == counts(hofForm(3)))
  }
}
