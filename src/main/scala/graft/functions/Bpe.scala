package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Byte-pair-encoding tokenizer induction + application — the
  * merge-rule tokenizer a real pretraining pipeline trains, replacing
  * nothing: `tx_vocab`/`tx_encode` stay as the whole-word baseline,
  * this is the subword path.
  *
  * Semantics (pinned, engine-portable, and what the DuckDB oracle
  * replays exactly):
  *  - candidate words = the top `maxWords` corpus words by
  *    (count DESC, word ASC), length 1..`maxLen` — the bounded head
  *    every real BPE trainer learns from;
  *  - each round merges the adjacent token pair with the highest
  *    occurrence-weighted count (ties: lexicographically smallest
  *    (left, right)), applied GREEDY LEFT-TO-RIGHT non-overlapping
  *    within every word — the textbook BPE application order, provably
  *    ≡ "replace the leftmost occurrence, repeat", which is how the
  *    SQL oracle expresses it as a recursive CTE.
  *
  * Scale shape: the only corpus-scale operation is the word-count
  * groupBy (one shuffle, map-side partial agg). Learning then runs on
  * the BOUNDED head — a documented ≤`maxWords`-row collect, the same
  * pattern as the PQ codebook fit (Similarity.scala) and exactly what
  * HuggingFace/sentencepiece trainers do after their distributed count
  * pass. The learned table (≤ k rules) broadcasts back into a pure
  * narrow projection for encoding — no corpus-side shuffle at all, the
  * shape a 100 TB tokenization pass must have.
  */
object Bpe {

  /** One learned merge: rank-r rule rewrites (lft, rgt) → merged.
    * Field names double as the output schema of `tx_bpe_vocab`. */
  final case class MergeRule(
    merge_rank: Int, lft: String, rgt: String, merged: String, pair_n: Long)

  /** Top corpus words to learn from: (count DESC, word ASC), bounded.
    * The collect is ≤ maxWords rows by construction. */
  def topWords(docs: DataFrame, normText: Column => Column,
               maxWords: Int, maxLen: Int): Seq[(String, Long)] =
    docs.select(explode(split(normText(col("text")), " ")).as("word"))
      .filter(length(col("word")).between(1, maxLen))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Learn up to k merge rules from weighted words (driver-side over
    * the bounded head; deterministic). */
  def learn(words: Seq[(String, Long)], k: Int): Seq[MergeRule] = {
    var seqs: Array[(Array[String], Long)] =
      words.map { case (w, n) => (codepointTokens(w), n) }.toArray
    val out = Seq.newBuilder[MergeRule]
    var r = 1
    var exhausted = false
    while (r <= k && !exhausted) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      seqs.foreach { case (t, n) =>
        var i = 0
        while (i < t.length - 1) {
          val key = (t(i), t(i + 1))
          counts.update(key, counts.getOrElse(key, 0L) + n)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((l, rt), n) = counts.reduce { (x, y) => if (better(x, y)) x else y }
        out += MergeRule(r, l, rt, l + rt, n)
        seqs = seqs.map { case (t, cnt) => (applyRule(t, l, rt), cnt) }
        r += 1
      }
    }
    out.result()
  }

  /** Greedy left-to-right non-overlapping application of one rule. */
  def applyRule(toks: Array[String], l: String, r: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.toArray
  }

  /** Driver-side full encode of one word (for specs / cross-checks). */
  def encodeWord(word: String, rules: Seq[MergeRule]): Array[String] =
    rules.foldLeft(codepointTokens(word)) { (t, m) => applyRule(t, m.lft, m.rgt) }

  /** Executor-side full encode with the inapplicable-rule skip: a rule
    * can only fire if BOTH its sides are currently tokens of the word,
    * so a token set turns the pass over a 32k-rule vocabulary into
    * O(k) hash probes + O(len) work for the few rules that apply.
    * Semantics identical to [[encodeWord]] (the set is refreshed after
    * every applied rule). */
  private[graft] def encodeWordBulk(word: String, rules: Array[MergeRule]): Array[String] = {
    var toks = codepointTokens(word)
    val present = mutable.HashSet.empty[String]
    present ++= toks
    var i = 0
    while (i < rules.length) {
      val m = rules(i)
      if (present.contains(m.lft) && present.contains(m.rgt)) {
        val applied = applyRule(toks, m.lft, m.rgt)
        if (applied.length != toks.length) {
          toks = applied
          present.clear()
          present ++= toks
        }
      }
      i += 1
    }
    toks
  }

  /** The PRODUCTION-SCALE apply form promised by [[MaxInlineRules]]:
    * rules ship once per executor as a broadcast TABLE and each word
    * is encoded by a compact JVM kernel — plan size O(1) in k, no
    * per-rule analysis or codegen, any vocabulary size (32k merges is
    * ~2 MB broadcast). Still a narrow projection: no shuffle, the
    * plan shape every 100 TB tokenization pass needs. Trade-off vs
    * [[applyMergesCol]]: the kernel is a Scala UDF (opaque to
    * whole-stage codegen), so below the inline ceiling the fold chain
    * wins on per-row cost; past it, this is the only form that
    * analyzes at all. Semantics are pinned identical (BpeProps). */
  def applyMergesBulkCol(spark: org.apache.spark.sql.SparkSession,
                         word: Column, rules: Seq[MergeRule]): Column = {
    // rules apply in CALLER order, exactly like applyMergesCol — the
    // two forms are pinned identical on the same input (BpeProps), so
    // neither may silently reorder. learnMerges emits rank order.
    //
    // broadcasts are memoized per (application, rules): a fresh
    // broadcast PER CALL would accumulate on every executor across a
    // bench/test session (a 32k-merge table is ~2 MB each). Entries
    // from stopped contexts are dropped on the next call; live
    // broadcasts are never destroyed here (a lazily-executed plan may
    // still hold one).
    val sc = spark.sparkContext
    val key = (sc.applicationId, rules)
    bcCache.keySet.removeIf(_._1 != sc.applicationId)
    val bc = bcCache.computeIfAbsent(key, _ => sc.broadcast(rules.toArray))
    udf((w: String) => if (w == null) null else encodeWordBulk(w, bc.value))
      .apply(word)
  }

  private val bcCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Seq[MergeRule]),
    org.apache.spark.broadcast.Broadcast[Array[MergeRule]]]()

  private def codepointTokens(w: String): Array[String] =
    w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  /** Tie-break comparison by CODEPOINT (≡ UTF-8 byte order, what
    * Spark's UTF8String and DuckDB's ORDER BY both use) — Java
    * String#compareTo ranks supplementary-plane chars below
    * U+E000..U+FFFF (UTF-16 code-unit order) and would diverge from
    * the oracle on such ties. */
  private def cpCompare(a: String, b: String): Int = {
    val ai = a.codePoints().iterator()
    val bi = b.codePoints().iterator()
    while (ai.hasNext && bi.hasNext) {
      val c = Integer.compare(ai.next(), bi.next())
      if (c != 0) return c
    }
    java.lang.Boolean.compare(ai.hasNext, bi.hasNext)
  }

  /** (count DESC, lft ASC, rgt ASC) under codepoint order. */
  private def better(x: ((String, String), Long), y: ((String, String), Long)): Boolean = {
    if (x._2 != y._2) return x._2 > y._2
    val c = cpCompare(x._1._1, y._1._1)
    if (c != 0) c < 0 else cpCompare(x._1._2, y._1._2) < 0
  }

  /** Column: split a word into per-codepoint tokens — the same
    * `regexp_replace(word, '(.)', '\\1 ')` construction the oracle
    * uses. DOTALL on the Java side: plain Java '.' excludes the
    * Unicode line terminators U+0085/U+2028/U+2029 (and \r) that
    * RE2's '.' matches, which would fuse such a character with its
    * neighbor here while the oracle splits it; with (?s) the only
    * residual dialect gap is \n, which normText has already collapsed
    * in both engines before any word reaches this function. */
  def charTokens(word: Column): Column =
    split(trim(regexp_replace(word, "(?s)(.)", "$1 ")), " ")

  /** Hard ceiling on the number of merge rules `applyMergesCol` will
    * inline. The expression tree is one `aggregate` fold PER RULE —
    * plan size linear in k (~35 expression nodes per rule) — and, the
    * binding constraint, Catalyst's Resolution batch spends one
    * iteration resolving each nested higher-order-function lambda:
    * with `spark.sql.analyzer.maxIterations` defaulting to 100, the
    * chain ANALYZES at k=96 and throws "Max iterations (100) reached"
    * at k=99 (measured on Spark 4.1). Measured cost inside the
    * working range (2048-word column, analyze+execute): k=12 ≈ 0.3 s,
    * k=64 ≈ 0.6 s, k=96 ≈ 0.6 s per pass — flat, because runtime is
    * k·|word| regardless of inlining. So 96 is the ceiling, set by
    * the analyzer, not the executor. A production tokenizer with a
    * 32k-merge vocabulary must NOT inline — use [[applyMergesBulkCol]]
    * (the broadcast-rule-table kernel: constant plan size, same
    * greedy-by-rank semantics, no per-rule analysis cost). */
  val MaxInlineRules: Int = 96

  /** Column: apply the learned rules in rank order to a token array.
    * Each rule is one `aggregate` fold — greedy left-to-right by the
    * same argument as `applyRule` (a just-merged token can never equal
    * the rule's left side, since merged is strictly longer). `get` not
    * `element_at`: null-safe on the empty accumulator under ANSI.
    * Refuses rule sets past [[MaxInlineRules]] — see its doc for the
    * measured plan-cost curve and the 32k-merge production form. */
  def applyMergesCol(tokens: Column, rules: Seq[MergeRule]): Column = {
    require(rules.size <= MaxInlineRules,
      s"applyMergesCol inlines one fold per rule (plan size linear in k); " +
        s"${rules.size} rules > MaxInlineRules=$MaxInlineRules — use the " +
        "broadcast-rule-table fixpoint form for production vocabularies")
    rules.foldLeft(tokens) { (acc, rule) =>
      aggregate(acc, typedLit(Seq.empty[String]), (a: Column, t: Column) =>
        when(get(a, size(a) - 1) === lit(rule.lft) && t === lit(rule.rgt),
          concat(slice(a, lit(1), size(a) - 1), array(lit(rule.merged))))
          .otherwise(concat(a, array(t))))
    }
  }

  // ---------------------------------------------------------------
  // DuckDB oracle generation — the same learn loop, unrolled: per
  // round, pair counts → best pair → recursive leftmost-replace.
  // Validated ≡ greedy BPE (MISMATCH-free) against an independent
  // reference implementation before being pinned here.
  // ---------------------------------------------------------------

  /** CTE chain ending in `merges(merge_rank, lft, rgt, merged, pat,
    * pair_n)` and `seq<k>(word, n, seq)`. Caller prepends
    * "WITH RECURSIVE" and appends the final SELECT. */
  def learnSqlCtes(normDuck: String, maxWords: Int, maxLen: Int, k: Int): String = {
    val head =
      s"""words0 AS MATERIALIZED (
         |  SELECT word, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM (SELECT unnest(string_split($normDuck, ' ')) AS word FROM documents)
         |  WHERE length(word) BETWEEN 1 AND $maxLen
         |  GROUP BY word ORDER BY n DESC, word LIMIT $maxWords),
         |seq0 AS MATERIALIZED (
         |  SELECT word, n, trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq
         |  FROM words0)""".stripMargin
    val rounds = (1 to k).map { r =>
      val p = r - 1
      s"""pc$r AS MATERIALIZED (
         |  SELECT toks[CAST(i AS INTEGER)] AS lft, toks[CAST(i AS INTEGER)+1] AS rgt,
         |         CAST(SUM(n) AS BIGINT) AS pair_n
         |  FROM (SELECT n, toks, unnest(range(1, len(toks))) AS i
         |        FROM (SELECT n, string_split(seq, ' ') AS toks FROM seq$p))
         |  GROUP BY 1, 2),
         |best$r AS MATERIALIZED (
         |  SELECT CAST($r AS INTEGER) AS merge_rank, lft, rgt, lft || rgt AS merged,
         |         ' ' || lft || ' ' || rgt || ' ' AS pat, pair_n
         |  FROM pc$r ORDER BY pair_n DESC, lft, rgt LIMIT 1),
         |app$r AS (
         |  SELECT s.word, s.n, ' ' || s.seq || ' ' AS seq FROM seq$p s
         |  UNION ALL
         |  SELECT a.word, a.n,
         |         substr(a.seq, 1, strpos(a.seq, b.pat) - 1) || ' ' || b.merged || ' ' ||
         |         substr(a.seq, strpos(a.seq, b.pat) + length(b.pat)) AS seq
         |  FROM app$r a JOIN best$r b ON strpos(a.seq, b.pat) > 0),
         |seq$r AS MATERIALIZED (
         |  SELECT word, n, trim(seq) AS seq FROM app$r a
         |  WHERE NOT EXISTS (SELECT 1 FROM best$r b WHERE strpos(a.seq, b.pat) > 0))""".stripMargin
    }
    val merges = "merges AS MATERIALIZED (" + (1 to k)
      .map(r => s"SELECT merge_rank, lft, rgt, merged, pat, pair_n FROM best$r")
      .mkString("\n  UNION ALL ") + ")"
    (head +: rounds :+ merges).mkString(",\n")
  }
}
