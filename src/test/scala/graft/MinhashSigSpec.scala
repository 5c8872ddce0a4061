package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** MinhashSig (the one-pass native min-hash signature): output arrays
  * byte-identical to the per-salt md5 HOF chain it replaced
  * (Dedup.sigExpr — which stays in the source as the reference
  * formulation), including null-element skipping, the empty-array
  * edge, multi-byte code points, and null propagation. */
class MinhashSigSpec extends SparkSpec {
  import spark.implicits._

  test("signatures match the sigExpr HOF form on randomized arrays") {
    val rnd = new scala.util.Random(17)
    val alphabet = "ab z09.éß€日本語🙂:|"
    val docs = (1 to 300).map { i =>
      val n = rnd.nextInt(40)
      (i, (1 to n).map { _ =>
        val len = rnd.nextInt(12)
        (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      })
    }
    for (k <- Seq(4, 16)) {
      val df = docs.toDF("id", "shingles")
        .select(col("id"), Dedup.minhashSig(col("shingles"), k).as("fast"),
          expr(Dedup.sigExpr("shingles", k)).as("ref"))
      val bad = df.filter(not(col("fast") <=> col("ref"))).collect()
      assert(bad.isEmpty, s"k=$k mismatches: ${bad.take(3).mkString(";")}")
    }
  }

  test("edges: empty array yields k nulls; null elements are skipped; null input propagates") {
    val df = Seq(
      (1, Seq.empty[String]),            // empty → all-null slots
      (2, Seq("")),                      // the [""] empty-text shingle
      (3, Seq("a", "a", "b"))            // duplicates (min is idempotent)
    ).toDF("id", "shingles")
    val both = df.select(col("id"),
      Dedup.minhashSig(col("shingles"), 16).as("fast"),
      expr(Dedup.sigExpr("shingles", 16)).as("ref"))
    assert(both.filter(not(col("fast") <=> col("ref"))).isEmpty)
    assert(both.filter(col("id") === 1).select(col("fast"))
      .first().getSeq[String](0).forall(_ == null))
    // null elements: md5 null-propagates and array_min skips nulls in
    // the reference — the expression must agree
    val withNulls = spark.sql(
      "SELECT array('x', CAST(NULL AS STRING), 'y') AS shingles")
    val r = withNulls.select(
      Dedup.minhashSig(col("shingles"), 4).as("fast"),
      expr(Dedup.sigExpr("shingles", 4)).as("ref")).first()
    assert(r.getSeq[String](0) == r.getSeq[String](1))
    assert(r.getSeq[String](0).forall(_ != null))
    // null input array → [null × k] in BOTH forms (the HOF's outer
    // transforms run over literal sequences, so the array itself is
    // never null — and banding's concat_ws then still groups
    // null-text docs; the expression must not null-propagate)
    val nr = spark.sql("SELECT CAST(NULL AS ARRAY<STRING>) AS shingles")
      .select(Dedup.minhashSig(col("shingles"), 4).as("fast"),
        expr(Dedup.sigExpr("shingles", 4)).as("ref")).first()
    assert(!nr.isNullAt(0) && !nr.isNullAt(1))
    assert(nr.getSeq[String](0) == nr.getSeq[String](1))
    assert(nr.getSeq[String](0).forall(_ == null))
  }
}
