package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions._

/** Text-analysis surface over the `documents` table (training-data
  * pipeline operators): token counting, quality scoring, language ID,
  * fingerprinting. Each is a narrow projection — the parquet scan
  * prunes to (doc_id, text) and everything downstream is codegen'd
  * expression work, so the operators scale linearly with no shuffle. */
object Text {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "tx_token_counts" -> ((s, dir) =>
      Tables(s, dir).documents.select(
        col("doc_id"),
        wsTokenCount(col("text")).as("ws_tokens"),
        bpeishTokenCount(col("text")).as("bpeish_tokens"))),
    "tx_quality" -> ((s, dir) =>
      Tables(s, dir).documents.select(
        col("doc_id"),
        length(col("text")).as("n_chars_m"),
        wsTokenCount(col("text")).as("ws_tokens"),
        stopwordHits(col("text")).as("stop_hits"),
        qualityScore(col("text")).as("quality_score"))),
    "tx_langid" -> ((s, dir) => {
      val hits = langHits(col("text"))
      Tables(s, dir).documents.select(
        Seq(col("doc_id"), col("lang").as("labeled_lang")) ++
        hits.map { case (l, c) => c.as(s"hits_$l") } :+
        langId(col("text")).as("pred_lang"): _*)
    }),
    "tx_fingerprint" -> ((s, dir) =>
      Tables(s, dir).documents.select(
        col("doc_id"),
        md5Fingerprint(col("text")).as("md5_fp"),
        shingleFingerprint(col("text")).as("shingle_fp"))),
    "tx_tfidf" -> ((s, dir) => {
      // top-3 distinguishing terms per document by tf-idf. The idf is
      // the LINEAR variant (n_docs/df, no log): IEEE multiply+divide
      // are correctly rounded, so both engines produce bit-identical
      // doubles — ln() is not correctly rounded and could flip the
      // hash compare in the last ulp. (Swapping in ln is a one-token
      // change; ranking is idf-monotone either way.)
      // Scale shape: explode → two partial-agg groupBys (tf keyed by
      // (doc, term), df keyed by term) → broadcast-joinable df table →
      // bounded per-doc window. n_docs rides along as a broadcast
      // scalar, not a driver-side collect.
      import org.apache.spark.sql.expressions.Window
      val docs = Tables(s, dir).documents
      val words = docs
        .select(col("doc_id"), explode(split(normText(col("text")), " ")).as("w"))
      val tf = words.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      val df = words.distinct().groupBy("w").agg(count(lit(1)).as("df"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val wnd = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("w"))
      tf.join(df, "w").crossJoin(broadcast(nDocs))
        .withColumn("score", col("tf").cast("double") * col("n_docs") / col("df"))
        .withColumn("rk", row_number().over(wnd))
        .filter(col("rk") <= 3)
        .select("doc_id", "w", "score", "rk")
    }),
    "tx_pii_redact" -> ((s, dir) =>
      // PII scrub — the mandatory pre-training pass over any crawled
      // corpus: count and replace email addresses and phone-shaped
      // digit runs. Pure codegen'd regex projection, no shuffle; the
      // patterns avoid constructs where Java and RE2 dialects diverge
      // so the oracle replays them identically.
      Tables(s, dir).documents.select(
        col("doc_id"),
        regexp_count(col("text"), lit(EmailRe)).as("n_emails"),
        regexp_count(col("text"), lit(PhoneRe)).as("n_phones"),
        regexp_replace(
          regexp_replace(col("text"), lit(EmailRe), lit("<EMAIL>")),
          lit(PhoneRe), lit("<PHONE>")).as("clean_text"))),
    "tx_ngram_profile" -> ((s, dir) => {
      // corpus profiling: top-5 character trigrams per labeled
      // language — explode → count (partial-agg map-side) → bounded
      // per-group selection. The profile table that a real n-gram
      // language-ID model trains from.
      import org.apache.spark.sql.expressions.Window
      // the corpus ships as one row-group here, so without this
      // spread the whole normalize+explode chain runs on ONE task —
      // and the partition count must be PINNED, because AQE sizes
      // coalescing by the exchange's bytes (a few hundred KB of text)
      // and would merge it straight back to one partition, blind to
      // the 300× row explosion downstream (measured: 2.3 s coalesced
      // → 0.7 s pinned at sf0.1). At corpus scale the scan
      // parallelizes across row groups by itself; the exchange ships
      // only text, never the exploded rows.
      val tri = Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .withColumn("t", normText(col("text")))
        // char_ngrams = the old transform/substr HOF minus its O(len²)
        // per-window re-scan (see CharNgrams.scala); windows identical
        .select(col("lang"), explode(expr("char_ngrams(t, 3)")).as("tri"))
      val w = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("tri"))
      tri.groupBy("lang", "tri").agg(count(lit(1)).as("n"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
    }),
    "tx_sft_format" -> ((s, dir) => {
      // SFT sample formatting — the last mile of a training-data
      // pipeline: render each document into an instruction template
      // (first 16 words as the prompt, remainder as the completion),
      // emit the prompt/completion token split a loss mask needs, and
      // gate out samples whose completion is too short to train on.
      // Pure codegen'd projection — no shuffle, linear scan; the
      // rendered sample ships as its md5 (the content-addressed form
      // a sample store dedups on), not the full string.
      val ws = split(normText(col("text")), " ")
      Tables(s, dir).documents
        .withColumn("ws", ws)
        .select(col("doc_id"),
          least(size(col("ws")), lit(16)).as("prompt_tokens"),
          greatest(size(col("ws")) - 16, lit(0)).as("completion_tokens"),
          md5(concat(
            lit("### Instruction:\n"),
            array_join(slice(col("ws"), 1, 16), " "),
            lit("\n\n### Response:\n"),
            array_join(expr("slice(ws, 17, greatest(size(ws) - 16, 1))"), " ")))
            .as("sample_md5"),
          (size(col("ws")) - 16 >= 10).as("keep"))
    }),
    "tx_fim" -> ((s, dir) => {
      // fill-in-the-middle sample construction — the FIM transform
      // infilling-capable code/text models train on: each document is
      // split into prefix / middle / suffix thirds (integer word
      // boundaries, so both engines cut identically) and rendered in
      // PSM order (<PRE> prefix <SUF> suffix <MID> middle). Like
      // tx_sft_format the rendered sample ships as its md5 and a
      // keep flag gates docs too short to infill. Pure codegen'd
      // projection — no shuffle, linear scan.
      val ws = split(normText(col("text")), " ")
      Tables(s, dir).documents
        .withColumn("ws", ws)
        .withColumn("n", size(col("ws")))
        .withColumn("p_end", expr("cast(n div 3 as int)"))
        .withColumn("m_end", expr("cast((2 * n) div 3 as int)"))
        .select(col("doc_id"),
          col("n").as("n_words"),
          col("p_end").as("prefix_tokens"),
          (col("m_end") - col("p_end")).as("middle_tokens"),
          (col("n") - col("m_end")).as("suffix_tokens"),
          md5(concat(
            lit("<PRE>"), array_join(expr("slice(ws, 1, p_end)"), " "),
            lit("<SUF>"), array_join(expr("slice(ws, m_end + 1, n - m_end)"), " "),
            lit("<MID>"), array_join(expr("slice(ws, p_end + 1, m_end - p_end)"), " ")))
            .as("psm_md5"),
          (col("n") >= 12).as("keep"))
    }),
    "tx_pref_pairs" -> ((s, dir) => {
      // preference-pair mining — DPO/RLHF data prep from a scored
      // corpus: within each (lang, source) cell, docs rank by quality
      // score (ties broken by doc_id) and the top half pairs
      // positionally with the bottom half (rank i ↔ rank i + half),
      // so every pair has chosen_score ≥ rejected_score by
      // construction and margins are well spread. Scale shape: ONE
      // window shuffle on the cell key, then a self-join on
      // (cell, rank) that reuses the same partitioning; cells are
      // independent so parallelism tracks the corpus. Margins are one
      // IEEE subtraction of the already-oracle-exact quality score.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("lang"), col("source"))
        .orderBy(col("score").desc, col("doc_id"))
      val ranked = Tables(s, dir).documents
        .select(col("doc_id"), col("lang"), col("source"),
          qualityScore(col("text")).as("score"))
        .withColumn("rk", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(
          Window.partitionBy(col("lang"), col("source"))))
        // `div`, not `/`: double division + int cast truncates in
        // Spark but rounds in DuckDB — integer division is identical
        .withColumn("half", expr("cast(cnt div 2 as int)"))
      val chosen = ranked.filter(col("rk") <= col("half"))
        .select(col("lang"), col("source"), col("rk").as("pair_rank"),
          col("doc_id").as("chosen_id"), col("score").as("chosen_score"),
          col("half"))
      val rejected = ranked
        .select(col("lang"), col("source"),
          col("rk").as("rej_rk"), col("doc_id").as("rejected_id"),
          col("score").as("rejected_score"))
      chosen.join(rejected,
          chosen("lang") === rejected("lang") &&
          chosen("source") === rejected("source") &&
          rejected("rej_rk") === chosen("pair_rank") + chosen("half"))
        .select(chosen("lang"), chosen("source"), col("pair_rank"),
          col("chosen_id"), col("rejected_id"),
          (col("chosen_score") - col("rejected_score")).as("margin"))
    }),
    "tx_chunk" -> ((s, dir) => {
      // sliding-window chunking — the operator that turns documents
      // into training samples: 50-word windows advancing by 40 (10
      // words of overlap so no boundary context is lost). Pure
      // projection + explode: chunk count per doc is
      // ceil((n-W)/S)+1 (min 1), computed inside the row — no shuffle,
      // scales linearly with corpus size. Short docs yield exactly one
      // whole-doc chunk; the final window truncates at the doc end.
      val (w, st) = (ChunkWords, ChunkStride)
      Tables(s, dir).documents
        .withColumn("words", split(normText(col("text")), " "))
        .select(col("doc_id"),
          posexplode(expr(
            s"""transform(
               |  sequence(0, greatest(CAST(ceil((size(words) - $w) / $st.0) AS INT), 0)),
               |  k -> concat_ws(' ', slice(words, k * $st + 1, $w)))""".stripMargin)))
        .select(col("doc_id"), col("pos").as("chunk_idx"),
          col("col").as("chunk_text"))
    }),
    "tx_hash_embed" -> ((s, dir) =>
      // declared form of the feature-hashing featurizer (see hashEmbed
      // below): exploded to one scalar row per (doc, dim) so every cell
      // is hashable by any downstream engine — the array form stays
      // available as the library function. posexplode keeps the dim
      // index without a join; still no extra shuffle (explode is a
      // projection over hashEmbed's single groupBy output).
      hashEmbed(Tables(s, dir).documents)
        .select(col("doc_id"), posexplode(col("embedding")))
        .select(col("doc_id"), col("pos").as("dim"), col("col").as("value"))),
    "tx_repetition" -> ((s, dir) => {
      // repetition-based quality signals (the Gopher/RefinedWeb family
      // of filters): a document whose mass concentrates in one
      // repeated bigram — or whose vocabulary collapses to few
      // distinct words — is boilerplate/spam, not prose, and gets
      // culled before training. Two exact fractions per doc:
      // dup_word_frac = 1 - distinct/total words, and
      // top_bigram_frac = occurrences of the most frequent word
      // bigram / total bigrams. Scale shape: one explode → one
      // (doc, gram) partial-agg groupBy → one bounded per-doc max —
      // linear, no wide rows; the scan prunes to (doc_id, text).
      // Divisions are single IEEE ops so the oracle matches
      // bit-for-bit.
      val docs = Tables(s, dir).documents
      val words = docs.select(col("doc_id"), split(normText(col("text")), " ").as("ws"))
      val base = words.select(col("doc_id"),
        size(col("ws")).as("n_words"),
        size(array_distinct(col("ws"))).as("n_distinct"))
      topBigram(words).join(base, Seq("doc_id"), "right")
        .select(col("doc_id"), col("n_words"),
          (lit(1.0) - col("n_distinct").cast("double") / col("n_words"))
            .as("dup_word_frac"),
          coalesce(col("top2").cast("double") / (col("n_words") - 1), lit(0.0))
            .as("top_bigram_frac"))
    }),
    "tx_filter_pipeline" -> ((s, dir) => {
      // composed keep/drop gate — the C4/Gopher-style filter pipeline
      // run before any pretraining corpus ships: minimum length,
      // repetition bounds, and a stopword prose signal (applied only
      // to the language whose stopword list this engine carries),
      // each emitted as its own boolean so downstream can audit WHY a
      // doc dropped, plus the conjunction. One scan, one bounded
      // per-doc bigram agg — same linear shape as tx_repetition;
      // thresholds sit at the corpus quartiles so the gate genuinely
      // splits (≈half keeps at sf0.01), not rubber-stamps.
      val docs = Tables(s, dir).documents
      val words = docs.select(col("doc_id"), col("lang"),
        stopwordHits(col("text")).as("stop_hits"),
        split(normText(col("text")), " ").as("ws"))
      val base = words.select(col("doc_id"), col("lang"), col("stop_hits"),
        size(col("ws")).as("n_words"),
        size(array_distinct(col("ws"))).as("n_distinct"))
      val gated = topBigram(words).join(base, Seq("doc_id"), "right")
        .select(col("doc_id"),
          (col("n_words") >= GateMinWords).as("len_ok"),
          (lit(1.0) - col("n_distinct").cast("double") / col("n_words")
            <= GateMaxDupFrac).as("rep_ok"),
          (coalesce(col("top2").cast("double") / (col("n_words") - 1), lit(0.0))
            <= GateMaxTopBigramFrac).as("bigram_ok"),
          (col("lang") =!= "en" || col("stop_hits") >= 1).as("stop_ok"))
      gated.withColumn("keep",
        col("len_ok") && col("rep_ok") && col("bigram_ok") && col("stop_ok"))
    }),
    "tx_pack" -> ((s, dir) => {
      // sequence packing — the concat-then-split step that turns a
      // cleaned corpus into fixed-length training windows: lay docs
      // end to end in doc_id order and record where each one lands
      // (bin = context window of PackTokens tokens, offset within
      // it). The global running total is a DISTRIBUTED two-pass
      // prefix sum — range-partition by doc_id, per-partition sums
      // to the driver (bounded: one long per partition), then a
      // per-partition running pass with the broadcast offsets — the
      // same shape as surrogateKeyScale, never a single-partition
      // global window. Exact integer arithmetic; the oracle replays
      // it as a window cumsum.
      val docs = Tables(s, dir).documents
        .select(col("doc_id"), wsTokenCount(col("text")).cast("long").as("n_tokens"))
      packPrefix(s, docs)
    }),
    "tx_lm_score" -> ((s, dir) => {
      // char-trigram LM surprisal — the distributable core of a
      // perplexity quality filter: per doc, the mean surprisal of its
      // character trigrams under the conditional model
      // p(c|ab) = n3(abc) / n2(ab) trained on the corpus itself
      // (n2 is the context count, i.e. Σ_c n3(abc), so probabilities
      // sum to 1 per context). Real logs drift across engines, so
      // surprisal is QUANTIZED to whole bits: floor(log2 n) =
      // length(bin(n)) - 1, hence bits = len(bin(n2)) - len(bin(n3))
      // ≥ 0 — pure integer arithmetic, bit-identical in any engine
      // and any execution order. Scale shape: the model tables are
      // bounded by charset³ no matter the corpus size, so both sit
      // broadcast; scoring is explode → two broadcast joins → one
      // partial-agg per-doc groupBy. The explode runs twice (train +
      // score) — recomputing a projection beats caching an exploded
      // copy of a 100 TB corpus. The repartition spreads the
      // single-row-group local file (see tx_ngram_profile).
      val spread = Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .withColumn("t", normText(col("text")))
      val tris = spread.select(col("doc_id"), explode(
          expr("char_ngrams(t, 3)")).as("tri"))
        .withColumn("big", substring(col("tri"), 1, 2))
      val n3 = tris.groupBy(col("tri")).agg(count(lit(1)).as("n3"))
      val n2 = n3.groupBy(substring(col("tri"), 1, 2).as("big"))
        .agg(sum(col("n3")).as("n2"))
      tris.join(broadcast(n3), Seq("tri"))
        .join(broadcast(n2), Seq("big"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tris"),
          sum(length(bin(col("n2"))) - length(bin(col("n3")))).as("bits_q"))
        .select(col("doc_id"), col("n_tris"), col("bits_q"),
          expr("(100 * bits_q) div n_tris").as("avg_bits_x100"))
    }),
    "tx_rarity" -> ((s, dir) => {
      // token-rarity quality signals — the frequency-based sibling of
      // a perplexity filter (no log, so both engines agree bit-for-
      // bit): per doc, the mean corpus frequency of its tokens (low ⇒
      // rare/noisy vocabulary) and the fraction covered by the
      // top-VocabSize vocab (low ⇒ heavy OOV). All-integer sums with
      // ONE division each at the end. Scale shape: global counts are
      // one groupBy; scoring joins the exploded corpus against the
      // count table on the word — broadcastable until the vocab
      // outgrows executors, then a plain shuffle join; the top-V cut
      // is a distributed TakeOrdered.
      val words = Tables(s, dir).documents
        .select(col("doc_id"),
          explode(split(normText(col("text")), " ")).as("word"))
      val counts = words.groupBy(col("word")).agg(count(lit(1)).as("n"))
      val top = counts.orderBy(col("n").desc, col("word")).limit(VocabSize)
        .select(col("word"), lit(1).as("in_vocab"))
      words.join(broadcast(counts), Seq("word"))
        .join(broadcast(top), Seq("word"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("n")).as("_sum_n"),
          sum(coalesce(col("in_vocab"), lit(0))).as("_in_v"))
        .select(col("doc_id"), col("n_tokens"),
          (col("_sum_n").cast("double") / col("n_tokens")).as("mean_token_freq"),
          (col("_in_v").cast("double") / col("n_tokens")).as("in_vocab_frac"))
    }),
    "tx_vocab" -> ((s, dir) => {
      // frequency-ranked vocabulary induction — choosing a token vocab
      // for a corpus: the top VocabSize words by count, each with its
      // cumulative coverage of the corpus (what fraction of all token
      // occurrences the vocab up to this rank explains — the curve
      // that decides vocab size). Scale shape: one partial-agg groupBy
      // on the word, a distributed TakeOrdered for the top-V cut, and
      // only THEN a single-partition window — over the V-row vocab,
      // never the corpus. Counts are exact integers; coverage is one
      // IEEE division at the end, so the oracle matches bit-for-bit.
      import org.apache.spark.sql.expressions.Window
      val counts = Tables(s, dir).documents
        .select(explode(split(normText(col("text")), " ")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("n_occurrences"))
      val total = counts.agg(sum(col("n_occurrences")).as("_t"))
      val top = counts.orderBy(col("n_occurrences").desc, col("word"))
        .limit(VocabSize)
      val w = Window.orderBy(col("n_occurrences").desc, col("word"))
        .rowsBetween(Window.unboundedPreceding, 0)
      top.crossJoin(broadcast(total))
        .withColumn("rank", row_number().over(
          Window.orderBy(col("n_occurrences").desc, col("word"))))
        .withColumn("coverage",
          sum(col("n_occurrences")).over(w).cast("double") / col("_t").cast("double"))
        .select("rank", "word", "n_occurrences", "coverage")
    }),
    "tx_dedup_spans" -> ((s, dir) => {
      // span-level exact dedup across the corpus — the RefinedWeb /
      // CCNet line-dedup shape (remove boilerplate lines everywhere
      // but their first occurrence), with synthetic span boundaries
      // (consecutive SpanWords-word segments) because this corpus has
      // no newlines. A span duplicated ANYWHERE keeps only its
      // occurrence with the smallest (doc_id, span_idx); every doc is
      // re-emitted with its surviving text and an audit count.
      // Scale shape: explode to one row per span, ONE keyed shuffle on
      // the span string for the first-occurrence window (identical to
      // exact dedup's groupBy-on-content-hash — at 100 TB hash the
      // span to a 128-bit key so the shuffle ships fingerprints, not
      // text), then one groupBy back to docs. Reassembly is
      // order-exact via array_sort over (span_idx, span) structs.
      val segExpr = s"""transform(
        |  sequence(0, CAST(ceil(size(ws) / $SpanWords.0) AS INT) - 1),
        |  k -> concat_ws(' ', slice(ws, k * $SpanWords + 1, $SpanWords)))""".stripMargin
      val segs = Tables(s, dir).documents
        .withColumn("ws", split(normText(col("text")), " "))
        .select(col("doc_id"), posexplode(expr(segExpr)))
        .select(col("doc_id"), col("pos").as("span_idx"), col("col").as("span"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("span")).orderBy(col("doc_id"), col("span_idx"))
      segs.withColumn("rk", row_number().over(w))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"),
          sum(when(col("rk") > 1, 1L).otherwise(0L)).as("n_dropped"),
          concat_ws(" ", expr(
            "transform(array_sort(collect_list(CASE WHEN rk = 1 THEN struct(span_idx, span) END)), x -> x.span)"))
            .as("clean_text"))
    }),
    "tx_split" -> ((s, dir) => {
      // deterministic train/val/test assignment — the split step every
      // training corpus needs: bucket = first two md5 hex digits of
      // the doc id (0..255), train < 205, val < 230, test above
      // (≈80/10/10). Pure codegen'd projection — no shuffle, no rand():
      // the assignment is a pure function of the id, so it is
      // reproducible on any engine, cluster size, or row order, and
      // STABLE under corpus growth (adding docs never reassigns
      // existing ones — the property rand()-based splits lose).
      val m = md5(col("doc_id").cast("string"))
      Tables(s, dir).documents
        .withColumn("m", m)
        .withColumn("bucket",
          expr("instr('0123456789abcdef', substr(m, 1, 1)) - 1") * 16 +
          expr("instr('0123456789abcdef', substr(m, 2, 1)) - 1"))
        .select(col("doc_id"), col("bucket"),
          when(col("bucket") < 205, "train")
            .when(col("bucket") < 230, "val")
            .otherwise("test").as("split"))
    }),
    "tx_cdc_chunk" -> ((s, dir) => {
      // content-defined chunking — the dedup-stable chunker: a cut
      // falls AFTER position i when the rolling window hash of the
      // trailing 8 chars (md5, first two hex digits zero → expected
      // chunk ≈ 256 chars) fires. Unlike tx_chunk's fixed windows,
      // boundaries depend only on LOCAL content, so inserting one
      // sentence shifts every fixed-window chunk after it but leaves
      // all CDC chunks outside the edited region byte-identical — the
      // property that makes chunk-hash dedup across near-identical
      // documents (and incremental re-embedding of edited docs) work.
      // Scale shape: pure projection + explode, no shuffle; the cut
      // scan is one HOF filter over the char positions. The window
      // condition requires i >= 8 so the substr window never starts
      // below position 1 (engines disagree on non-positive substr
      // starts).
      // NOTE (round 17): a char_ngrams(t, 8)-bound variant of this
      // filter (element_at over a pre-built window array instead of
      // the per-position substr re-scan) was MEASURED and rejected —
      // the per-position md5 is the rolling hash's intrinsic dominant
      // cost (definitional, oracle-mirrored), and materializing the
      // O(len) gram array made 8k-char docs ~2× SLOWER (11-17 s vs
      // 5.6-6.4 s per 256 docs) for a ~20% edge only at 32k chars.
      // The substr form stays.
      Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .withColumn("t", normText(col("text")))
        .withColumn("bounds", expr(
          """concat(array(0),
            |  filter(sequence(1, greatest(length(t), 1)),
            |    i -> i >= 8 AND i < length(t)
            |         AND substr(md5(substr(t, i - 7, 8)), 1, 2) = '00'),
            |  array(length(t)))""".stripMargin))
        .select(col("doc_id"), col("t"),
          posexplode(expr(
            """transform(sequence(1, size(bounds) - 1),
              |  j -> named_struct(
              |    'cs', element_at(bounds, j) + 1,
              |    'cl', element_at(bounds, j + 1) - element_at(bounds, j)))"""
              .stripMargin)))
        .select(col("doc_id"), col("pos").as("chunk_idx"),
          col("col.cs").as("chunk_start"), col("col.cl").as("chunk_len"),
          md5(expr("substr(t, col.cs, col.cl)")).as("chunk_hash"))
    }),
    "tx_corpus_mix" -> ((s, dir) => {
      // deterministic domain mixing — the "data mix" step of a
      // pretraining pipeline: cap every (lang, source) cell at
      // MixCap docs, chosen by md5(doc_id) order. Hash order is
      // uniform-random-like but IDENTICAL on any engine, cluster
      // size, or partitioning — the mix is reproducible forever,
      // which `ORDER BY rand()` never is. One shuffle (the window
      // partition); per-cell state is a bounded rank counter.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang"), col("source"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      Tables(s, dir).documents
        .withColumn("pick_rank", row_number().over(w))
        .filter(col("pick_rank") <= MixCap)
        .select("doc_id", "lang", "source", "pick_rank")
    }),
    "tx_encode" -> ((s, dir) => {
      // tokenizer APPLICATION — the encode step between vocab
      // induction (tx_vocab) and packing (tx_pack): each document's
      // first EncodeMaxTokens words map to their frequency-rank vocab
      // id, out-of-vocabulary words to 0 (the UNK convention). The
      // vocab is bounded (VocabSize rows) so it BROADCASTS; encoding
      // is a slice + posexplode + one broadcast join — O(tokens) with
      // no corpus-side shuffle, the shape a 100 TB tokenization pass
      // must have.
      import org.apache.spark.sql.expressions.Window
      val docs = Tables(s, dir).documents
      val counts = docs
        .select(explode(split(normText(col("text")), " ")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
      val vocab = counts.orderBy(col("n").desc, col("word")).limit(VocabSize)
        .withColumn("token_id",
          row_number().over(Window.orderBy(col("n").desc, col("word"))))
        .select("word", "token_id")
      docs.select(col("doc_id"), posexplode(
          slice(split(normText(col("text")), " "), 1, EncodeMaxTokens)))
        .withColumnRenamed("pos", "pos0").withColumnRenamed("col", "word")
        .join(broadcast(vocab), Seq("word"), "left")
        .select(col("doc_id"), (col("pos0") + 1).as("pos"),
          coalesce(col("token_id"), lit(0)).as("token_id"))
    }),
    "tx_bpe_vocab" -> ((s, dir) => {
      // merge-rule BPE induction (see functions/Bpe.scala for the
      // pinned semantics + scale rationale): one corpus-scale word
      // count, then a deterministic driver-side learn over the
      // bounded ≤BpeWords head — the HF/sentencepiece trainer shape.
      val rules = graft.functions.Bpe.learn(
        graft.functions.Bpe.topWords(Tables(s, dir).documents,
          normText, BpeWords, BpeWordLenMax), BpeMerges)
      s.createDataFrame(rules)
        .select("merge_rank", "lft", "rgt", "merged", "pair_n")
    }),
    "tx_bpe_encode" -> ((s, dir) => {
      // subword tokenizer APPLICATION: the k learned merges, applied
      // in rank order to every document's first BpeEncodeWords words.
      // The rules are driver values (≤ BpeMerges of them) baked into
      // the expression — encoding is a pure narrow projection over
      // the corpus, one `aggregate` fold per rule, no joins and no
      // shuffle: the only scale-relevant property a 100 TB tokenize
      // pass needs.
      import graft.functions.Bpe
      val rules = Bpe.learn(
        Bpe.topWords(Tables(s, dir).documents,
          normText, BpeWords, BpeWordLenMax), BpeMerges)
      Tables(s, dir).documents
        .select(col("doc_id"), posexplode(
          slice(split(normText(col("text")), " "), 1, BpeEncodeWords)))
        .withColumnRenamed("pos", "pos0").withColumnRenamed("col", "word")
        .withColumn("toks", Bpe.applyMergesCol(Bpe.charTokens(col("word")), rules))
        .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("word"),
          size(col("toks")).as("n_tokens"),
          array_join(col("toks"), "|").as("tokens"))
    }),
    "tx_mix_temperature" -> ((s, dir) => {
      // temperature-flattened domain sampling — the mixing law most
      // pretraining recipes actually use (sample ∝ n^T, T<1, so small
      // domains are up-weighted relative to their share): each
      // (lang, source) cell gets quota = Target · isqrt(n) / Σ isqrt(n)
      // (T = 0.5), docs chosen in md5(doc_id) order. Everything is
      // INTEGER arithmetic — isqrt = floor(sqrt(n)) is exact per cell
      // (IEEE sqrt is correctly rounded, unlike pow) and the quota is
      // one integer multiply + divide — so the sample is bit-identical
      // on any engine, which `sample ∝ n^0.7 of rand()` never is.
      // Scale shape: the cell table is bounded (domains × languages),
      // so quotas broadcast; the pick is the same single window
      // shuffle as tx_corpus_mix.
      val docs = Tables(s, dir).documents
      val cells = docs.groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("isq", floor(sqrt(col("n_docs"))).cast("long"))
      val totIsq = cells.agg(sum(col("isq")).as("tot"))
      val quotas = cells.crossJoin(broadcast(totIsq))
        .select(col("lang"), col("source"), col("n_docs"),
          // `div`, not `/`: Spark's `/` is double division and DuckDB
          // rounds double→int casts where Spark truncates — integer
          // division is identical everywhere
          expr(s"($MixTarget * isq) div tot").as("quota"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang"), col("source"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      docs.withColumn("pick_rank", row_number().over(w))
        .join(broadcast(quotas), Seq("lang", "source"))
        .filter(col("pick_rank") <= col("quota"))
        .select("doc_id", "lang", "source", "pick_rank", "quota")
    }),
    "tx_shard" -> ((s, dir) => {
      // training-shard assignment — the write-side layout step after
      // the corpus is built: every doc lands in one of ShardCount
      // shards by md5 hash (decorrelated from doc_id order, so shards
      // are statistically interchangeable), with a deterministic
      // position within its shard (md5 order again — a reproducible
      // global shuffle, the property `ORDER BY rand()` can't give).
      // Scale shape: one hash projection + one window shuffle
      // partitioned BY SHARD — each shard's position counter is
      // independent, so parallelism is ShardCount-wide regardless of
      // corpus size, and the output is exactly what a sharded writer
      // would partitionBy.
      val h = md5(col("doc_id").cast("string"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("shard_id")).orderBy(col("h"), col("doc_id"))
      Tables(s, dir).documents
        .select(col("doc_id"), h.as("h"))
        .withColumn("shard_id",
          (expr("instr('0123456789abcdef', substr(h, 1, 1)) - 1") * 16 +
            expr("instr('0123456789abcdef', substr(h, 2, 1)) - 1")) % ShardCount)
        .withColumn("pos", row_number().over(w))
        .select(col("doc_id"), col("shard_id").cast("int").as("shard_id"),
          col("pos"))
    }))

  /** Feature-hashing document embeddings (the hashing trick): every
    * word hashes to one of 64 buckets with an independent ±1 sign; the
    * doc vector is the signed bucket histogram, L2-normalized. This
    * closes the text → embedding → ANN/dedup loop with a model-free,
    * engine-independent featurizer: buckets and signs are md5-digit
    * arithmetic and the coordinates are integer sums normalized by one
    * exact division, so any engine reproduces the vectors bit-for-bit.
    * Scale shape: explode → one partial-agg groupBy on doc_id (64
    * conditional sums ride the same shuffle); normalization is a
    * projection. Returns (doc_id, embedding: array<double>[64]). */
  def hashEmbed(docs: DataFrame): DataFrame = {
    val words = docs
      .select(col("doc_id"), explode(split(normText(col("text")), " ")).as("w"))
      .withColumn("m", md5(col("w")))
      .withColumn("b",
        (expr("instr('0123456789abcdef', substr(m, 1, 1)) - 1") * 16 +
          expr("instr('0123456789abcdef', substr(m, 2, 1)) - 1")) % HashDims)
      .withColumn("sg",
        (expr("instr('0123456789abcdef', substr(m, 3, 1)) - 1") % 2) * 2 - 1)
    val sums = (0 until HashDims).map(d =>
      sum(when(col("b") === d, col("sg")).otherwise(0)).as(s"v_$d"))
    words.groupBy(col("doc_id")).agg(sums.head, sums.tail: _*)
      .withColumn("raw",
        array((0 until HashDims).map(d => col(s"v_$d").cast("double")): _*))
      .withColumn("_n", sqrt(expr("vec_dot(raw, raw)")))
      .select(col("doc_id"),
        when(col("_n") > 0, expr("transform(raw, x -> x / _n)"))
          .otherwise(col("raw")).as("embedding"))
  }

  /** Most-frequent word bigram count per doc (docs with ≥2 words) —
    * shared by tx_repetition and tx_filter_pipeline. Input needs
    * (doc_id, ws: array<string>). */
  private[queries] def topBigram(words: DataFrame): DataFrame =
    words.filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(ws) - 1), i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))")).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("top2"))

  private[queries] val MixCap = 50
  private[queries] val PackTokens = 512L
  private val MixTarget = 200L
  private val ShardCount = 16
  private val EncodeMaxTokens = 32

  /** Quality-gate thresholds — ONE definition consumed by
    * tx_filter_pipeline, the flagship corpus build (Flagship.scala),
    * the streaming front-door (DocumentStream.scala), and every one of
    * their oracles, so a threshold tweak can never desynchronize the
    * batch and streaming halves of the pipeline or their oracles. */
  private[graft] val GateMinWords = 30
  private[graft] val GateMaxDupFrac = 0.65
  private[graft] val GateMaxTopBigramFrac = 0.08

  /** The gate decision over arbitrary input EXPRESSIONS — the one
    * definition of the quality rule. Callers with plain columns use
    * [[gatePredicate]]; the streaming front-door calls this directly
    * with lambda-bound values (DocumentStream binds nrm/ws once per
    * row, so the gate inputs must be expressions over those bound
    * variables, not column names). */
  private[graft] def gateKeep(nWords: org.apache.spark.sql.Column,
                              nDistinct: org.apache.spark.sql.Column,
                              top2: org.apache.spark.sql.Column,
                              lang: org.apache.spark.sql.Column,
                              stopHits: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    nWords >= GateMinWords &&
      lit(1.0) - nDistinct.cast("double") / nWords <= GateMaxDupFrac &&
      coalesce(top2.cast("double") / (nWords - 1), lit(0.0)) <= GateMaxTopBigramFrac &&
      (lang =!= "en" || stopHits >= 1)

  /** The gate over (n_words, n_distinct, top2, lang, stop_hits). */
  private[graft] def gatePredicate: org.apache.spark.sql.Column =
    gateKeep(col("n_words"), col("n_distinct"), col("top2"),
      col("lang"), col("stop_hits"))

  /** DuckDB rendering of gatePredicate, same column names in scope. */
  private[queries] val gateWhereSql: String =
    s"n_words >= $GateMinWords " +
      s"AND 1.0 - CAST(n_distinct AS DOUBLE) / n_words <= $GateMaxDupFrac " +
      s"AND coalesce(CAST(top2 AS DOUBLE) / (n_words - 1), 0.0) <= $GateMaxTopBigramFrac " +
      "AND (lang <> 'en' OR stop_hits >= 1)"

  /** Distributed two-pass prefix sum used by tx_pack and the flagship
    * corpus build: range-partition by doc_id, per-partition token sums
    * to the driver (bounded: one long per partition), then a
    * per-partition running pass with the broadcast offsets — never a
    * single-partition global window. Input must carry `doc_id` and
    * `n_tokens: long`; every input column passes through, with
    * cum_start / bin_id / bin_offset (bin = PackTokens window)
    * appended. Exact integer arithmetic end to end. */
  private[graft] def packPrefix(s: SparkSession, df: DataFrame): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val parts = s.sparkContext.defaultParallelism
    val ordered = df.repartitionByRange(parts, col("doc_id"))
      .sortWithinPartitions("doc_id")
    val tokIdx = ordered.schema.fieldIndex("n_tokens")
    val rdd = ordered.rdd
    // a NULL token count (null-text doc) packs as width 0 — the row
    // keeps its place in the layout without advancing the cursor
    def tok(r: org.apache.spark.sql.Row): Long =
      if (r.isNullAt(tokIdx)) 0L else r.getLong(tokIdx)
    val partSums = rdd.mapPartitionsWithIndex { case (i, it) =>
      Iterator.single(i -> it.map(tok).sum)
    }.collect().toMap
    val offsets = (0 until rdd.getNumPartitions).scanLeft(0L)((acc, i) =>
      acc + partSums.getOrElse(i, 0L))
    val out = rdd.mapPartitionsWithIndex { case (i, it) =>
      var cum = offsets(i)
      it.map { r =>
        val start = cum
        cum += tok(r)
        Row.fromSeq(r.toSeq ++ Seq(start, start / PackTokens, start % PackTokens))
      }
    }
    s.createDataFrame(out, StructType(ordered.schema.fields ++
      Seq("cum_start", "bin_id", "bin_offset")
        .map(StructField(_, LongType, nullable = false))))
  }
  private val SpanWords = 4
  private val VocabSize = 500

  private val BpeWords = 2048
  private val BpeWordLenMax = 20
  private val BpeMerges = 12
  private val BpeEncodeWords = 24

  private val HashDims = 64
  private val ChunkWords = 50
  private val ChunkStride = 40

  private[queries] val normDuck = """regexp_replace(trim(lower(text)), '\s+', ' ', 'g')"""

  private[queries] val stopsEn = "the|and|of|to|in|is|a"

  /** DuckDB replica of TextFunctions.qualityScore — ONE definition
    * consumed by both the tx_quality and tx_pref_pairs oracles, so a
    * score tweak cannot silently desynchronize them. (Declared AFTER
    * stopsEn: object vals initialize in declaration order, and an
    * earlier placement interpolated stopsEn as the string "null".) */
  private[queries] val scoreDuck: String =
    s"""least(CAST(len(regexp_extract_all(lower(text), '\\b($stopsEn)\\b')) AS DOUBLE)
       |        / len(string_split_regex(trim(text), '\\s+')) * 2.0, 1.0) * 0.5
       |+ least(CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
       |        / len(string_split_regex(trim(text), '\\s+')) / 10.0, 1.0) * 0.5""".stripMargin
  /** PII patterns shared by the Spark query and the DuckDB oracle —
    * plain greedy classes/quantifiers only (identical semantics in
    * Java regex and RE2). */
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\+?[0-9][0-9 -]{7,}[0-9]"

  val oracles: Map[String, String] = Map(
    "tx_token_counts" ->
      """SELECT doc_id,
        |       len(string_split_regex(trim(text), '\s+')) AS ws_tokens,
        |       len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\s]')) AS bpeish_tokens
        |FROM documents""".stripMargin,
    "tx_quality" ->
      s"""SELECT doc_id,
         |       length(text) AS n_chars_m,
         |       len(string_split_regex(trim(text), '\\s+')) AS ws_tokens,
         |       len(regexp_extract_all(lower(text), '\\b($stopsEn)\\b')) AS stop_hits,
         |       $scoreDuck
         |         AS quality_score
         |FROM documents""".stripMargin,
    "tx_langid" ->
      """SELECT doc_id, lang AS labeled_lang,
        |       len(regexp_extract_all(lower(text), '\b(the|and|of|to|is)\b'))   AS hits_en,
        |       len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist)\b')) AS hits_de,
        |       len(regexp_extract_all(lower(text), '\b(le|la|et|les|est)\b'))   AS hits_fr,
        |       len(regexp_extract_all(lower(text), '\b(el|los|las|es|y)\b'))    AS hits_es,
        |       CASE WHEN greatest(hits_en, hits_de, hits_fr, hits_es) = 0 THEN 'unknown'
        |            WHEN hits_en = greatest(hits_en, hits_de, hits_fr, hits_es) THEN 'en'
        |            WHEN hits_de = greatest(hits_en, hits_de, hits_fr, hits_es) THEN 'de'
        |            WHEN hits_fr = greatest(hits_en, hits_de, hits_fr, hits_es) THEN 'fr'
        |            ELSE 'es' END AS pred_lang
        |FROM documents""".stripMargin,
    "tx_tfidf" ->
      """WITH words AS (
        |  SELECT doc_id,
        |         unnest(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')) AS w
        |  FROM documents),
        |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM words GROUP BY 1, 2),
        |df AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents)
        |SELECT doc_id, w, score, rk FROM (
        |  SELECT tf.doc_id, tf.w,
        |         CAST(tf.tf AS DOUBLE) * n_docs / df.df AS score,
        |         ROW_NUMBER() OVER (PARTITION BY tf.doc_id
        |           ORDER BY CAST(tf.tf AS DOUBLE) * n_docs / df.df DESC, tf.w) AS rk
        |  FROM tf JOIN df USING (w) CROSS JOIN n)
        |WHERE rk <= 3""".stripMargin,
    "tx_pii_redact" ->
      s"""SELECT doc_id,
         |       len(regexp_extract_all(text, '$EmailRe')) AS n_emails,
         |       len(regexp_extract_all(text, '$PhoneRe')) AS n_phones,
         |       regexp_replace(regexp_replace(text, '$EmailRe', '<EMAIL>', 'g'),
         |                      '$PhoneRe', '<PHONE>', 'g') AS clean_text
         |FROM documents""".stripMargin,
    "tx_ngram_profile" ->
      """WITH tri AS (
        |  SELECT lang,
        |         unnest(list_transform(
        |           range(1, greatest(length(t) - 2, 1) + 1),
        |           i -> substr(t, i, 3))) AS tri
        |  FROM (SELECT lang,
        |               regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t
        |        FROM documents)),
        |counts AS (SELECT lang, tri, COUNT(*) AS n FROM tri GROUP BY lang, tri)
        |SELECT lang, tri, n, rk FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, tri) AS rk
        |  FROM counts)
        |WHERE rk <= 5""".stripMargin,
    "tx_fingerprint" ->
      """WITH norm AS (
        |  SELECT doc_id,
        |         regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t,
        |         string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS words
        |  FROM documents)
        |SELECT doc_id,
        |       md5(t) AS md5_fp,
        |       CASE WHEN len(words) >= 5
        |            THEN list_min(list_transform(range(1, len(words) - 3),
        |                   i -> md5(array_to_string(words[i:i+4], ' '))))
        |            ELSE md5(t) END AS shingle_fp
        |FROM norm""".stripMargin,
    "tx_sft_format" ->
      s"""WITH w AS (SELECT doc_id, string_split($normDuck, ' ') AS ws
         |           FROM documents)
         |SELECT doc_id,
         |       CAST(least(len(ws), 16) AS INTEGER) AS prompt_tokens,
         |       CAST(greatest(len(ws) - 16, 0) AS INTEGER) AS completion_tokens,
         |       md5('### Instruction:' || chr(10)
         |           || array_to_string(ws[1:16], ' ')
         |           || chr(10) || chr(10) || '### Response:' || chr(10)
         |           || coalesce(array_to_string(
         |                ws[17:16 + greatest(len(ws) - 16, 1)], ' '), ''))
         |         AS sample_md5,
         |       len(ws) - 16 >= 10 AS keep
         |FROM w""".stripMargin,
    "tx_chunk" ->
      s"""WITH d AS (SELECT doc_id, string_split($normDuck, ' ') AS words
         |           FROM documents),
         |c AS (
         |  SELECT doc_id,
         |         unnest(list_transform(
         |           range(0, CAST(greatest(ceil((len(words) - $ChunkWords) / $ChunkStride.0), 0) AS INT) + 1),
         |           k -> struct_pack(chunk_idx := k,
         |                  chunk_text := array_to_string(
         |                    words[k * $ChunkStride + 1 : k * $ChunkStride + $ChunkWords], ' ')))) AS ch
         |  FROM d)
         |SELECT doc_id, CAST(ch.chunk_idx AS INT) AS chunk_idx,
         |       ch.chunk_text AS chunk_text
         |FROM c""".stripMargin,
    "tx_cdc_chunk" ->
      s"""WITH d AS (SELECT doc_id, $normDuck AS t FROM documents),
         |b AS (
         |  SELECT doc_id, t,
         |         list_concat(list_concat([0],
         |           list_filter(range(1, greatest(length(t), 1) + 1),
         |             i -> i >= 8 AND i < length(t)
         |                  AND substr(md5(substr(t, i - 7, 8)), 1, 2) = '00')),
         |           [length(t)]) AS bounds
         |  FROM d)
         |SELECT doc_id, CAST(j - 1 AS INT) AS chunk_idx,
         |       CAST(bounds[j] + 1 AS INT) AS chunk_start,
         |       CAST(bounds[j + 1] - bounds[j] AS INT) AS chunk_len,
         |       md5(substr(t, CAST(bounds[j] + 1 AS INT),
         |                  CAST(bounds[j + 1] - bounds[j] AS INT))) AS chunk_hash
         |FROM b, unnest(range(1, len(bounds))) AS u(j)""".stripMargin,
    "tx_hash_embed" ->
      s"""WITH w AS (
         |  SELECT doc_id, md5(unnest(string_split($normDuck, ' '))) AS m
         |  FROM documents),
         |h AS (
         |  SELECT doc_id,
         |         ((instr('0123456789abcdef', substr(m, 1, 1)) - 1) * 16
         |          + (instr('0123456789abcdef', substr(m, 2, 1)) - 1)) % 64 AS b,
         |         ((instr('0123456789abcdef', substr(m, 3, 1)) - 1) % 2) * 2 - 1 AS sg
         |  FROM w),
         |agg AS (SELECT doc_id, b, SUM(sg) AS v FROM h GROUP BY 1, 2),
         |filled AS (
         |  SELECT d.doc_id, r.range AS b, CAST(COALESCE(a.v, 0) AS DOUBLE) AS v
         |  FROM (SELECT DISTINCT doc_id FROM documents) d
         |  CROSS JOIN range(64) r
         |  LEFT JOIN agg a ON a.doc_id = d.doc_id AND a.b = r.range),
         |norms AS (SELECT doc_id, sqrt(SUM(v * v)) AS n FROM filled GROUP BY doc_id)
         |SELECT f.doc_id, CAST(f.b AS INT) AS dim,
         |       CASE WHEN n > 0 THEN f.v / n ELSE f.v END AS value
         |FROM filled f JOIN norms USING (doc_id)""".stripMargin,
    "tx_lm_score" ->
      s"""WITH d AS (SELECT doc_id, $normDuck AS t FROM documents),
         |tr AS (
         |  SELECT doc_id,
         |         unnest(list_transform(
         |           range(1, greatest(length(t) - 2, 1) + 1),
         |           i -> substr(t, i, 3))) AS tri
         |  FROM d),
         |tb AS (SELECT doc_id, tri, substr(tri, 1, 2) AS big FROM tr),
         |n3 AS (SELECT tri, COUNT(*) AS n3 FROM tb GROUP BY 1),
         |n2 AS (SELECT substr(tri, 1, 2) AS big,
         |              CAST(SUM(n3) AS BIGINT) AS n2 FROM n3 GROUP BY 1)
         |SELECT tb.doc_id, COUNT(*) AS n_tris,
         |       CAST(SUM(length(bin(n2.n2)) - length(bin(n3.n3)))
         |            AS BIGINT) AS bits_q,
         |       (100 * CAST(SUM(length(bin(n2.n2)) - length(bin(n3.n3)))
         |                   AS BIGINT)) // COUNT(*) AS avg_bits_x100
         |FROM tb JOIN n3 USING (tri) JOIN n2 USING (big)
         |GROUP BY 1""".stripMargin,
    "tx_rarity" ->
      s"""WITH words AS (
         |  SELECT doc_id, unnest(string_split($normDuck, ' ')) AS word
         |  FROM documents),
         |counts AS (SELECT word, COUNT(*) AS n FROM words GROUP BY 1),
         |top AS (SELECT word, 1 AS in_vocab FROM counts
         |        ORDER BY n DESC, word LIMIT $VocabSize)
         |SELECT w.doc_id, COUNT(*) AS n_tokens,
         |       CAST(SUM(c.n) AS DOUBLE) / COUNT(*) AS mean_token_freq,
         |       CAST(SUM(coalesce(t.in_vocab, 0)) AS DOUBLE) / COUNT(*)
         |         AS in_vocab_frac
         |FROM words w JOIN counts c USING (word)
         |LEFT JOIN top t USING (word)
         |GROUP BY 1""".stripMargin,
    "tx_vocab" ->
      s"""WITH words AS (
         |  SELECT unnest(string_split($normDuck, ' ')) AS word FROM documents),
         |counts AS (SELECT word, COUNT(*) AS n_occurrences FROM words GROUP BY 1),
         |tot AS (SELECT CAST(SUM(n_occurrences) AS BIGINT) AS t FROM counts),
         |top AS (SELECT word, n_occurrences FROM counts
         |        ORDER BY n_occurrences DESC, word LIMIT $VocabSize)
         |SELECT CAST(ROW_NUMBER() OVER w AS INT) AS rank, word, n_occurrences,
         |       CAST(SUM(n_occurrences) OVER (ORDER BY n_occurrences DESC, word
         |              ROWS UNBOUNDED PRECEDING) AS DOUBLE)
         |         / (SELECT t FROM tot) AS coverage
         |FROM top
         |WINDOW w AS (ORDER BY n_occurrences DESC, word)""".stripMargin,
    "tx_dedup_spans" ->
      s"""WITH w AS (SELECT doc_id, string_split($normDuck, ' ') AS ws FROM documents),
         |segs0 AS (
         |  SELECT doc_id,
         |         unnest(list_transform(
         |           range(0, CAST(ceil(len(ws) / $SpanWords.0) AS INT)),
         |           k -> struct_pack(span_idx := k,
         |                  span := array_to_string(
         |                    ws[k * $SpanWords + 1 : k * $SpanWords + $SpanWords], ' ')))) AS sp
         |  FROM w),
         |marked AS (
         |  SELECT doc_id, CAST(sp.span_idx AS INT) AS span_idx, sp.span AS span,
         |         ROW_NUMBER() OVER (PARTITION BY sp.span
         |           ORDER BY doc_id, sp.span_idx) AS rk
         |  FROM segs0)
         |SELECT doc_id, COUNT(*) AS n_spans,
         |       CAST(SUM(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
         |       coalesce(string_agg(CASE WHEN rk = 1 THEN span END, ' '
         |                           ORDER BY span_idx), '') AS clean_text
         |FROM marked GROUP BY doc_id""".stripMargin,
    "tx_split" ->
      """WITH h AS (
        |  SELECT doc_id,
        |         (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
        |         + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
        |           AS bucket
        |  FROM documents)
        |SELECT doc_id, CAST(bucket AS INT) AS bucket,
        |       CASE WHEN bucket < 205 THEN 'train'
        |            WHEN bucket < 230 THEN 'val'
        |            ELSE 'test' END AS split
        |FROM h""".stripMargin,
    "tx_corpus_mix" ->
      s"""SELECT doc_id, lang, source, pick_rank FROM (
         |  SELECT doc_id, lang, source,
         |         ROW_NUMBER() OVER (PARTITION BY lang, source
         |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS pick_rank
         |  FROM documents)
         |WHERE pick_rank <= $MixCap""".stripMargin,
    "tx_encode" ->
      s"""WITH words AS (
         |  SELECT unnest(string_split($normDuck, ' ')) AS word FROM documents),
         |counts AS (SELECT word, COUNT(*) AS n FROM words GROUP BY 1),
         |vocab AS (SELECT word, CAST(ROW_NUMBER() OVER (ORDER BY n DESC, word) AS INT)
         |                 AS token_id
         |          FROM (SELECT word, n FROM counts
         |                ORDER BY n DESC, word LIMIT $VocabSize)),
         |toks AS (SELECT doc_id, CAST(i AS INT) AS pos, ws[CAST(i AS INT)] AS word
         |         FROM (SELECT doc_id, string_split($normDuck, ' ') AS ws FROM documents),
         |              range(1, $EncodeMaxTokens + 1) t(i)
         |         WHERE i <= len(ws))
         |SELECT t.doc_id, t.pos, coalesce(v.token_id, 0) AS token_id
         |FROM toks t LEFT JOIN vocab v USING (word)""".stripMargin,
    "tx_fim" ->
      s"""WITH w AS (SELECT doc_id, string_split($normDuck, ' ') AS ws FROM documents),
         |d AS (SELECT doc_id, ws, CAST(len(ws) AS INTEGER) AS n,
         |             CAST(len(ws) // 3 AS INTEGER) AS p_end,
         |             CAST((2 * len(ws)) // 3 AS INTEGER) AS m_end
         |      FROM w)
         |SELECT doc_id, n AS n_words, p_end AS prefix_tokens,
         |       m_end - p_end AS middle_tokens, n - m_end AS suffix_tokens,
         |       md5('<PRE>' || array_to_string(ws[1:p_end], ' ') ||
         |           '<SUF>' || array_to_string(ws[m_end+1:n], ' ') ||
         |           '<MID>' || array_to_string(ws[p_end+1:m_end], ' ')) AS psm_md5,
         |       n >= 12 AS keep
         |FROM d""".stripMargin,
    "tx_pref_pairs" ->
      s"""WITH sc AS (
         |  SELECT doc_id, lang, source,
         |         $scoreDuck
         |           AS score
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, lang, source, score,
         |         ROW_NUMBER() OVER (PARTITION BY lang, source
         |                            ORDER BY score DESC, doc_id) AS rk,
         |         CAST(COUNT(*) OVER (PARTITION BY lang, source) // 2 AS INTEGER) AS half
         |  FROM sc)
         |SELECT c.lang, c.source, c.rk AS pair_rank,
         |       c.doc_id AS chosen_id, j.doc_id AS rejected_id,
         |       c.score - j.score AS margin
         |FROM r c JOIN r j
         |  ON c.lang = j.lang AND c.source = j.source AND j.rk = c.rk + c.half
         |WHERE c.rk <= c.half""".stripMargin,
    // BPE oracles: the learn loop unrolled as generated CTEs — per
    // round, pair counts → best pair → recursive leftmost-replace
    // (≡ greedy left-to-right application; see functions/Bpe.scala).
    "tx_bpe_vocab" ->
      ("WITH RECURSIVE\n" +
        graft.functions.Bpe.learnSqlCtes(normDuck, BpeWords, BpeWordLenMax, BpeMerges) +
        "\nSELECT merge_rank, lft, rgt, merged, pair_n FROM merges"),
    "tx_bpe_encode" ->
      ("WITH RECURSIVE\n" +
        graft.functions.Bpe.learnSqlCtes(normDuck, BpeWords, BpeWordLenMax, BpeMerges) +
        s""",
           |dw AS MATERIALIZED (
           |  SELECT doc_id,
           |         CAST(unnest(range(1, least(len(ws), $BpeEncodeWords) + 1)) AS INTEGER) AS pos,
           |         ws
           |  FROM (SELECT doc_id, string_split($normDuck, ' ') AS ws FROM documents)),
           |dw2 AS MATERIALIZED (SELECT doc_id, pos, ws[pos] AS word FROM dw),
           |enc AS (
           |  SELECT doc_id, pos, word,
           |         ' ' || trim(regexp_replace(word, '(.)', '\\1 ', 'g')) || ' ' AS seq,
           |         1 AS r
           |  FROM dw2
           |  UNION ALL
           |  SELECT e.doc_id, e.pos, e.word,
           |         CASE WHEN strpos(e.seq, m.pat) > 0
           |              THEN substr(e.seq, 1, strpos(e.seq, m.pat) - 1) || ' ' || m.merged || ' ' ||
           |                   substr(e.seq, strpos(e.seq, m.pat) + length(m.pat))
           |              ELSE e.seq END AS seq,
           |         CASE WHEN strpos(e.seq, m.pat) > 0 THEN e.r ELSE e.r + 1 END AS r
           |  FROM enc e JOIN merges m ON m.merge_rank = e.r)
           |SELECT doc_id, pos, word,
           |       CAST(len(string_split(trim(seq), ' ')) AS INTEGER) AS n_tokens,
           |       array_to_string(string_split(trim(seq), ' '), '|') AS tokens
           |FROM enc WHERE r > (SELECT coalesce(max(merge_rank), 0) FROM merges)""".stripMargin),
    "tx_mix_temperature" ->
      s"""WITH cells AS (SELECT lang, source, COUNT(*) AS n_docs,
         |                      CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT) AS isq
         |               FROM documents GROUP BY 1, 2),
         |tot AS (SELECT SUM(isq) AS tot FROM cells),
         |q AS (SELECT lang, source, CAST(($MixTarget * isq) // tot AS BIGINT) AS quota
         |      FROM cells CROSS JOIN tot),
         |r AS (SELECT doc_id, lang, source,
         |             ROW_NUMBER() OVER (PARTITION BY lang, source
         |               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS pick_rank
         |      FROM documents)
         |SELECT r.doc_id, r.lang, r.source, r.pick_rank, q.quota
         |FROM r JOIN q USING (lang, source)
         |WHERE r.pick_rank <= q.quota""".stripMargin,
    "tx_shard" ->
      s"""WITH h AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
         |sh AS (SELECT doc_id, h,
         |              CAST(((instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
         |                    + (instr('0123456789abcdef', substr(h, 2, 1)) - 1))
         |                   % $ShardCount AS INT) AS shard_id
         |       FROM h)
         |SELECT doc_id, shard_id,
         |       ROW_NUMBER() OVER (PARTITION BY shard_id ORDER BY h, doc_id) AS pos
         |FROM sh""".stripMargin,
    "tx_filter_pipeline" ->
      s"""WITH w AS (SELECT doc_id, lang,
         |             len(regexp_extract_all(lower(text), '\\b($stopsEn)\\b')) AS stop_hits,
         |             string_split($normDuck, ' ') AS ws FROM documents),
         |b AS (SELECT doc_id, lang, stop_hits, len(ws) AS n_words,
         |             len(list_distinct(ws)) AS n_distinct FROM w),
         |t AS (SELECT doc_id, MAX(c) AS top2 FROM (
         |        SELECT doc_id, g, COUNT(*) AS c FROM (
         |          SELECT doc_id, unnest(list_transform(range(1, len(ws)),
         |                 i -> ws[i] || ' ' || ws[i+1])) AS g
         |          FROM w WHERE len(ws) >= 2) GROUP BY doc_id, g)
         |      GROUP BY doc_id)
         |SELECT doc_id,
         |       n_words >= $GateMinWords AS len_ok,
         |       1.0 - CAST(n_distinct AS DOUBLE) / n_words <= $GateMaxDupFrac AS rep_ok,
         |       coalesce(CAST(top2 AS DOUBLE) / (n_words - 1), 0.0) <= $GateMaxTopBigramFrac AS bigram_ok,
         |       (lang <> 'en' OR stop_hits >= 1) AS stop_ok,
         |       ($gateWhereSql) AS keep
         |FROM b LEFT JOIN t USING (doc_id)""".stripMargin,
    "tx_pack" ->
      s"""WITH t AS (SELECT doc_id,
         |             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
         |           FROM documents),
         |c AS (SELECT doc_id, n_tokens,
         |             CAST(coalesce(SUM(n_tokens) OVER (ORDER BY doc_id
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_start
         |      FROM t)
         |SELECT doc_id, n_tokens, cum_start,
         |       CAST(cum_start // $PackTokens AS BIGINT) AS bin_id,
         |       CAST(cum_start % $PackTokens AS BIGINT) AS bin_offset
         |FROM c""".stripMargin,
    "tx_repetition" ->
      s"""WITH w AS (SELECT doc_id, string_split($normDuck, ' ') AS ws FROM documents),
         |b AS (SELECT doc_id, len(ws) AS n_words,
         |             len(list_distinct(ws)) AS n_distinct FROM w),
         |t AS (SELECT doc_id, MAX(c) AS top2 FROM (
         |        SELECT doc_id, g, COUNT(*) AS c FROM (
         |          SELECT doc_id, unnest(list_transform(range(1, len(ws)),
         |                 i -> ws[i] || ' ' || ws[i+1])) AS g
         |          FROM w WHERE len(ws) >= 2) GROUP BY doc_id, g)
         |      GROUP BY doc_id)
         |SELECT b.doc_id, n_words,
         |       1.0 - CAST(n_distinct AS DOUBLE) / n_words AS dup_word_frac,
         |       coalesce(CAST(top2 AS DOUBLE) / (n_words - 1), 0.0) AS top_bigram_frac
         |FROM b LEFT JOIN t USING (doc_id)""".stripMargin)
}
