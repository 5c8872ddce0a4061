package graft

import org.apache.spark.sql.functions._
import graft.functions.Bpe
import graft.functions.TextFunctions.normText

/** Pins the measured facts behind [[Bpe.MaxInlineRules]]: the inline
  * merge chain analyzes and executes across the whole permitted range
  * (the deep end included), and the first thing past the ceiling is a
  * clear refusal — NOT the analyzer's opaque "Max iterations (100)
  * reached" (which is what k≈99 hits: Resolution spends one iteration
  * per nested higher-order-function lambda). */
class BpeCurveSpec extends SparkSpec {
  import spark.implicits._

  // corpus rules run out near 89 on the tiny fixture; pad with inert
  // synthetic rules (tokens that occur in no word) purely to reach the
  // plan DEPTH under test — the depth, not the rule content, is what
  // stresses the analyzer
  private def rulesOf(k: Int): Seq[Bpe.MergeRule] = {
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.001").documents
    val learned = Bpe.learn(Bpe.topWords(docs, normText, 2048, 20), k)
    learned.take(k) ++ (learned.size until k).map(i =>
      Bpe.MergeRule(i + 1, s"zq$i", s"xw$i", s"zq${i}xw$i", 1L))
  }

  test("inline chain analyzes and executes at k = 12, 64 and the 96 ceiling") {
    val df = Seq("lowest", "newest", "wider", "zqxw").toDF("word")
    for (k <- Seq(12, 64, Bpe.MaxInlineRules)) {
      val rules = rulesOf(k)
      val out = df
        .withColumn("toks", Bpe.applyMergesCol(Bpe.charTokens(col("word")), rules))
        .select($"word", array_join($"toks", "|"))
        .as[(String, String)].collect().toMap
      // semantics hold at every depth, not just "it didn't throw"
      out.foreach { case (w, got) =>
        assert(got == Bpe.encodeWord(w, rules).mkString("|"), s"k=$k word=$w")
      }
    }
  }

  test("past the ceiling: refusal, not an analyzer blowup") {
    val tooMany = rulesOf(Bpe.MaxInlineRules + 1)
    val e = intercept[IllegalArgumentException] {
      Bpe.applyMergesCol(Bpe.charTokens(col("word")), tooMany)
    }
    assert(e.getMessage.contains("MaxInlineRules"))
  }

  test("bulk (broadcast-table) form: any k, identical semantics") {
    // 300 rules — far past the inline analyzer ceiling — through the
    // production form, cross-checked against the driver reference on
    // real corpus words at k=64 too (where both forms are available)
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.001").documents
    val words = Bpe.topWords(docs, normText, 512, 20)
    val df = words.map(_._1).toDF("word")
    for (k <- Seq(64, 300)) {
      val rules = rulesOf(k)
      val got = df
        .withColumn("toks", Bpe.applyMergesBulkCol(spark, col("word"), rules))
        .select($"word", array_join($"toks", "|"))
        .as[(String, String)].collect().toMap
      words.foreach { case (w, _) =>
        assert(got(w) == Bpe.encodeWord(w, rules).mkString("|"),
          s"bulk/driver divergence on '$w' at k=$k")
      }
    }
  }
}
