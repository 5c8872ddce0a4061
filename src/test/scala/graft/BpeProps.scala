package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.functions.Bpe

/** Property pins for the BPE kernel — the equivalence arguments the
  * DuckDB oracle RELIES on, as executable evidence. */
object BpeProps extends Properties("bpe") {

  // short alphabet so merges and runs actually collide
  private val genWord: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))

  private val genWords: Gen[Seq[(String, Long)]] =
    Gen.listOf(genWord.flatMap(w => Gen.chooseNum(1L, 9L).map(w -> _)))
      .map(_.groupMapReduce(_._1)(_._2)(_ + _).toSeq)

  /** "Replace the leftmost occurrence, repeat" — the recursive-CTE
    * formulation the oracle executes. */
  private def leftmostRepeat(toks: Array[String], l: String, r: String): Array[String] = {
    var cur = toks
    var i = firstAt(cur, l, r)
    while (i >= 0) {
      cur = (cur.take(i) :+ (l + r)) ++ cur.drop(i + 2)
      i = firstAt(cur, l, r)
    }
    cur
  }
  private def firstAt(t: Array[String], l: String, r: String): Int = {
    var i = 0
    while (i < t.length - 1) {
      if (t(i) == l && t(i + 1) == r) return i
      i += 1
    }
    -1
  }

  property("greedy left-to-right == leftmost-replace-repeat (oracle form)") =
    forAll(genWord, Gen.oneOf("a", "b", "c", "ab", "aa"),
           Gen.oneOf("a", "b", "c", "ab", "aa")) { (w, l, r) =>
      val toks = w.map(_.toString).toArray
      Bpe.applyRule(toks, l, r).toSeq == leftmostRepeat(toks, l, r).toSeq
    }

  property("applying a rule never increases token count; concat is invariant") =
    forAll(genWord, Gen.oneOf("a", "b", "c"), Gen.oneOf("a", "b", "c")) { (w, l, r) =>
      val toks = w.map(_.toString).toArray
      val out = Bpe.applyRule(toks, l, r)
      out.length <= toks.length && out.mkString == w
    }

  property("learn is deterministic and ranks have strictly joinable order") =
    forAll(genWords) { words =>
      val a = Bpe.learn(words, 6)
      val b = Bpe.learn(words, 6)
      a == b && a.map(_.merge_rank) == (1 to a.size) &&
        a.forall(m => m.merged == m.lft + m.rgt)
    }

  property("a merged single-char pair never reappears in the final tokens") =
    forAll(genWords) { words =>
      // merges only ever create tokens of length ≥ 2, so a single
      // char can never be re-created — once a (char, char) rule has
      // applied, that adjacency is gone for good. (For multi-char
      // rules the guarantee is per-round only: a later merge CAN
      // re-create an equal token string via a different split.)
      val rules = Bpe.learn(words, 6)
      val charRules = rules.filter(m => m.lft.length == 1 && m.rgt.length == 1)
      words.forall { case (w, _) =>
        val finalToks = Bpe.encodeWord(w, rules)
        charRules.forall(m => firstAt(finalToks, m.lft, m.rgt) < 0)
      }
    }

  property("full encode reconstructs the word under any learned ruleset") =
    forAll(genWords, genWord) { (words, w) =>
      val rules = Bpe.learn(words, 6)
      Bpe.encodeWord(w, rules).mkString == w
    }

  // arbitrary (not just learned) rule chains, including interacting
  // multi-char rules — the bulk kernel's skip-set must never change
  // the sequential greedy semantics
  private val genRule: Gen[(String, String)] = for {
    l <- Gen.oneOf("a", "b", "c", "ab", "bc", "aa", "abc")
    r <- Gen.oneOf("a", "b", "c", "ab", "bc", "aa", "cab")
  } yield (l, r)

  property("bulk (skip-set) encode == sequential encode for any rule chain") =
    forAll(genWord, Gen.listOfN(12, genRule)) { (w, rs) =>
      val rules = rs.zipWithIndex.map { case ((l, r), i) =>
        Bpe.MergeRule(i + 1, l, r, l + r, 1L) }
      Bpe.encodeWordBulk(w, rules.toArray).toSeq ==
        Bpe.encodeWord(w, rules).toSeq
    }
}
