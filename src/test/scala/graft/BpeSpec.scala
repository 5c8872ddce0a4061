package graft

import org.apache.spark.sql.functions._
import graft.functions.Bpe
import graft.functions.TextFunctions.normText

/** Pins the BPE semantics: hand-derived merges on the textbook
  * corpus, and plan-side application ≡ the driver-side greedy
  * reference on real corpus words. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learn: merges and tie-breaks match hand derivation") {
    // pair counts r1: es=9, st=9 (tie → lexicographically smaller
    // (e,s) wins), then est=9, then lo=7/ow=7 tie → lo, then low=7.
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val rules = Bpe.learn(words, 4)
    assert(rules.map(_.merged) == Seq("es", "est", "lo", "low"))
    assert(rules.map(_.pair_n) == Seq(9L, 9L, 7L, 7L))
    assert(rules.map(_.merge_rank) == Seq(1, 2, 3, 4))
  }

  test("applyRule is greedy left-to-right non-overlapping") {
    // runs of the same token: [a,a,a,a,a] + (a,a) → [aa,aa,a]
    assert(Bpe.applyRule(Array("a", "a", "a", "a", "a"), "a", "a").toSeq ==
      Seq("aa", "aa", "a"))
    // merged output does not cascade within the same rule pass
    assert(Bpe.applyRule(Array("a", "b", "b"), "a", "b").toSeq == Seq("ab", "b"))
  }

  test("learn stops when no pairs remain") {
    val rules = Bpe.learn(Seq(("ab", 3L)), 10)
    assert(rules.map(_.merged) == Seq("ab"))
  }

  test("applyMergesCol ≡ driver greedy encode on real corpus words") {
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.001").documents
    val words = Bpe.topWords(docs, normText, 2048, 20)
    val rules = Bpe.learn(words, 12)
    assert(rules.size == 12)
    val got = words.map(_._1).toDF("word")
      .withColumn("toks", Bpe.applyMergesCol(Bpe.charTokens(col("word")), rules))
      .select($"word", array_join($"toks", "|"))
      .as[(String, String)].collect().toMap
    words.foreach { case (w, _) =>
      assert(got(w) == Bpe.encodeWord(w, rules).mkString("|"),
        s"column/driver encode divergence on '$w'")
    }
  }

  test("applyMergesCol ≡ driver greedy encode at k=64 (deep-inline ceiling)") {
    // the k=12 test above exercises the inventory's rule count; this
    // one pins the deep end of the inline range — 64 chained folds
    // still analyze, codegen and agree with the driver reference
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.001").documents
    val words = Bpe.topWords(docs, normText, 2048, 20)
    val rules = Bpe.learn(words, 64)
    assert(rules.size == 64)
    val got = words.map(_._1).toDF("word")
      .withColumn("toks", Bpe.applyMergesCol(Bpe.charTokens(col("word")), rules))
      .select($"word", array_join($"toks", "|"))
      .as[(String, String)].collect().toMap
    words.foreach { case (w, _) =>
      assert(got(w) == Bpe.encodeWord(w, rules).mkString("|"),
        s"column/driver encode divergence on '$w' at k=64")
    }
    // past the ceiling the builder refuses rather than hand Catalyst
    // an unbounded plan
    val tooMany = (1 to Bpe.MaxInlineRules + 1)
      .map(i => Bpe.MergeRule(i, "a", "b", "ab", 1L))
    assertThrows[IllegalArgumentException] {
      Bpe.applyMergesCol(Bpe.charTokens(col("word")), tooMany)
    }
  }

  test("tx_bpe_encode: tokens reconstruct the word, counts consistent") {
    val enc = graft.queries.Text.queries("tx_bpe_encode")(spark, "/root/testdata/sf0.001")
    val bad = enc.filter(
      translate(col("tokens"), "|", "") =!= col("word") ||
      size(split(col("tokens"), "\\|")) =!= col("n_tokens") ||
      col("n_tokens") > length(col("word")))
    assert(bad.count() == 0)
    assert(enc.filter(col("n_tokens") < length(col("word"))).count() > 0,
      "no word was ever compressed — merges not applied")
  }
}
