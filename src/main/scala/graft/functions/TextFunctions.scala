package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data
  * pipelines: tokenization counts, quality scoring, n-gram language
  * ID, and content fingerprinting.
  *
  * Everything here is a composition of built-in (whole-stage-codegen'd)
  * expressions — no UDFs — so the hot path stays inside Tungsten and
  * the same logic is expressible in the DuckDB oracle for bit-exact
  * verification. All regexes are ASCII-word-boundary based and valid
  * in both Java regex and RE2.
  */
object TextFunctions {

  /** Whitespace-collapsed, lower-cased canonical form. */
  def normText(c: Column): Column =
    regexp_replace(trim(lower(c)), "\\s+", " ")

  /** Whitespace token count. */
  def wsTokenCount(c: Column): Column =
    size(split(trim(c), "\\s+"))

  /** BPE-ish subword count: letter runs, single digits, and isolated
    * punctuation each count as one token (the classic pre-tokenizer
    * regex shape). */
  def bpeishTokenCount(c: Column): Column =
    regexp_count(lower(c), lit("[a-z]+|[0-9]|[^a-z0-9\\s]"))

  private val stopwordsEn = "the|and|of|to|in|is|a"

  /** Stopword hits (English list) — word-boundary matches don't consume
    * the delimiter, so consecutive stopwords all count. */
  def stopwordHits(c: Column): Column =
    regexp_count(lower(c), lit(s"\\b($stopwordsEn)\\b"))

  /** Heuristic quality score in [0,1]: balance of stopword density
    * (fluency proxy) and mean token length (noise proxy). */
  def qualityScore(c: Column): Column = {
    val nTokens = wsTokenCount(c).cast("double")
    val stopRatio = stopwordHits(c).cast("double") / nTokens
    val meanTokLen = length(regexp_replace(c, "\\s+", "")).cast("double") / nTokens
    least(stopRatio * 2.0, lit(1.0)) * 0.5 + least(meanTokLen / 10.0, lit(1.0)) * 0.5
  }

  private val langStops: Seq[(String, String)] = Seq(
    "en" -> "the|and|of|to|is",
    "de" -> "der|die|und|das|ist",
    "fr" -> "le|la|et|les|est",
    "es" -> "el|los|las|es|y")

  /** Per-language stopword-hit columns (n-gram heuristic evidence). */
  def langHits(c: Column): Seq[(String, Column)] =
    langStops.map { case (lang, words) =>
      lang -> regexp_count(lower(c), lit(s"\\b($words)\\b"))
    }

  /** Predicted language: argmax of stopword hits with a fixed
    * tie-break order (en > de > fr > es), 'unknown' when no evidence. */
  def langId(c: Column): Column = {
    val hits = langHits(c)
    val best = greatest(hits.map(_._2): _*)
    hits.foldRight(lit("unknown")) { case ((lang, h), acc) =>
      when(best > 0 && h === best, lit(lang)).otherwise(acc)
    }
  }

  /** Whole-content fingerprint: md5 of the canonical form. */
  def md5Fingerprint(c: Column): Column = md5(normText(c))

  /** Rolling 5-gram fingerprint: the minimum md5 over all 5-word
    * shingles of the canonical form (a 1-permutation MinHash — stable
    * under small edits, unlike the whole-content hash). Falls back to
    * the whole-content hash for texts shorter than 5 words. */
  def shingleFingerprint(c: Column, n: Int = 5): Column = {
    val words = split(normText(c), " ")
    val shingles = transform(
      sequence(lit(1), size(words) - (n - 1)),
      i => md5(concat_ws(" ", slice(words, i, lit(n)))))
    when(size(words) >= n, array_min(shingles)).otherwise(md5Fingerprint(c))
  }
}
