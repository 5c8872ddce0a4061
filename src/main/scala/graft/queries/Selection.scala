package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.FixedLog
import graft.functions.TextFunctions.normText
import graft.operators.Dedup

/** Data-selection operators — the model-free core of the "which docs
  * do we actually train on" stage of an LLM data pipeline, downstream
  * of cleaning/dedup (Text.scala, DedupQueries.scala) and upstream of
  * mixing/packing (tx_corpus_mix, tx_pack):
  *
  *  - `sel_dsir`: hashed-n-gram importance weighting (the DSIR
  *    recipe: score every raw doc by how target-domain-like its
  *    hashed unigram distribution is, keep the top-K) — also deployed
  *    ONLINE as the stateless streaming gate `st_sel_gate`
  *    (streaming/DocumentStream.scala) via [[dsirCompiled]];
  *  - `sel_nb_langid`: a multinomial Naive Bayes classifier trained
  *    on half the corpus and scored on the other half — the
  *    fasttext-style learned filter, reduced to count arithmetic;
  *  - `sel_contrastive_pairs`: (anchor, positive, in-batch negative)
  *    triplets for embedding-model training, positives mined from the
  *    MinHash near-dup pairs;
  *  - `sel_softdedup`: near-dup clusters reweighted (1/|cluster|)
  *    instead of removed;
  *  - `sel_curriculum`: quality-annealed epoch entry per mixture cell;
  *  - `sel_datacard`: the corpus data card — per-cell and rolled-up
  *    stats in one cube shuffle;
  *  - `sel_source_cap`: domain-frequency capping — over-represented
  *    sources hash-thinned to a corpus-share cap, deterministically;
  *  - `sel_drift`: PSI-style drift monitor between two corpus
  *    snapshots, integer-exact per hashed-unigram bucket.
  *
  * Cross-engine exactness: every log-probability is an exact integer
  * in 1/256-bit fixed point via [[FixedLog]] (`floor(256*log2 n)` from
  * bit-length + a shared 256-entry mantissa table) — real ln() is not
  * correctly rounded and would drift between engines; the whole-bit
  * `length(bin(n))` quantization (tx_lm_score) is exact but too
  * coarse for CLASSIFICATION, where the signal lives in sub-bit
  * probability ratios and a whole-bit normalizer term swamps it
  * (measured: whole-bit NB collapses to the smallest class at 12%
  * accuracy; 1/256-bit NB behaves like real NB). The log lookups run
  * on MODEL tables only (≤ Buckets rows), never per token.
  *
  * Data-ceiling note: the synthetic corpus draws every lang's text
  * from ONE shared vocabulary, so no content-based classifier can
  * beat the majority class on it and DSIR's lang='en' target slice is
  * distribution-identical to the raw corpus — held-out accuracy and
  * enrichment on the test tables sit at that ceiling by construction.
  * SelectionSpec pins the real semantics on crafted fixtures whose
  * classes ARE lexically separable.
  */
object Selection {
  type Q = (SparkSession, String) => DataFrame

  /** Hash buckets for the unigram feature space. 256 = the two
    * leading md5 hex chars, so the bucket falls out of the digest
    * with no modulo. Real DSIR uses 10k buckets over uni+bigrams;
    * the bucket count is a constant, not a scale knob — the model
    * table stays ≤ Buckets rows no matter the corpus size. */
  private val Buckets = 256
  /** Docs kept by the DSIR selection step. */
  private val DsirK = 100
  /** In-batch group count for negative sampling. Semantic constant
    * (defines which pairs share a "batch"), not a parallelism knob. */
  private val CpBatches = 8
  /** Class labels for the NB classifier — the corpus' lang values,
    * alphabetical; CASE order below is the deterministic tie-break. */
  private val Langs = Seq("de", "en", "es", "fr", "zh")
  /** Curriculum length: docs enter training over this many epochs. */
  private val CurriculumEpochs = 3
  /** No source may exceed 1/CapDenom of the corpus (sel_source_cap). */
  private val CapDenom = 4
  /** Hash-rate granularity for the source cap: thresholds live on a
    * 16-bit grid (the doc hash is a 4-hex-digit md5 slice), so the
    * per-source keep rate is exact to 1/65536. private[graft]: the
    * streaming gate's full-rate default must sit on the SAME grid. */
  private[graft] val CapGrain = 65536

  /** (doc_id, lang, b) — one row per token, b = hashed unigram bucket
    * from the two leading md5 hex chars (0..255). The repartition
    * spreads the single-row-group local file (see tx_ngram_profile);
    * at corpus scale the scan's own splits parallelize and the
    * exchange ships (id, lang, text) once. */
  private[graft] def hashedWords(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).documents
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), col("lang"),
        explode(split(normText(col("text")), " ")).as("w"))
      .withColumn("m", md5(col("w")))
      .withColumn("b",
        expr("(instr('0123456789abcdef', substr(m, 1, 1)) - 1) * 16" +
          " + instr('0123456789abcdef', substr(m, 2, 1)) - 1"))
      .drop("w", "m")

  val queries: Map[String, Q] = Map(
    "sel_dsir" -> ((s, dir) => {
      // DSIR importance weighting (Xie et al. 2023, "Data Selection
      // for Language Models via Importance Resampling"): featurize
      // every doc as hashed unigram counts, weight each token by
      // log2 p_target(b) - log2 p_raw(b) under add-one-smoothed
      // bucket models (target = the lang='en' slice standing in for
      // the in-domain corpus; raw = everything), sum per doc, keep
      // the top-K. In 1/256-bit fixed point the per-token weight is
      // llog(n_t(b)+1) - llog(n_r(b)+1); the smoothing denominators
      // (T+B vs R+B) are per-token constants that shift every doc's
      // score by the same n_tokens-linear term, so the emitted score
      // adds that term explicitly to stay faithful to the paper's
      // unnormalized log-weight. Scale shape: one groupBy on the
      // bucket (model ≤ 256 rows, log lookups run HERE, broadcast),
      // one partial-agg groupBy per doc summing precomputed ints, and
      // a distributed TakeOrdered for the top-K cut joined back as a
      // flag — no window over the corpus, no driver-side data.
      // the scored frame feeds BOTH the top-K cut and the final flag
      // join; without the eager checkpoint the whole scan → explode →
      // model-join → per-doc agg pipeline executed twice (the plan
      // held two full copies of the subtree). One row per doc — slim
      // at any corpus size — and the lineage cut releases the
      // pipeline; Bench/Verify's inter-query hygiene reclaims the
      // blocks.
      val perDoc = dsirPerDoc(s, dir).localCheckpoint(true)
      val top = perDoc.orderBy(col("dsir_fp").desc, col("doc_id"))
        .limit(DsirK).select(col("doc_id"), lit(1).as("_sel"))
      perDoc.join(broadcast(top), Seq("doc_id"), "left")
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          col("dsir_fp"), coalesce(col("_sel"), lit(0)).as("selected"))
    }),
    "sel_nb_langid" -> ((s, dir) => {
      // Multinomial Naive Bayes over hashed unigrams — the learned
      // classifier-filter shape (quality/domain/language gating with
      // a trained model) with exact count arithmetic: train on the
      // even-doc_id half, score the odd half.
      //   score_c = llog(docs_c + 1)                     [prior]
      //           + Σ_tokens llog(n_{c,b} + 1)           [likelihood]
      //           - n_tokens * llog(n_c + Buckets)       [normalizer]
      // — add-one-smoothed multinomial NB in 1/256-bit fixed point.
      // Scale shape: the model is ≤ 256 rows × one count per class
      // (one groupBy of the train half) and carries its log lookups;
      // class totals/priors are one broadcast row; scoring is
      // explode → broadcast join → one per-doc partial agg over
      // precomputed integers. Nothing grows with corpus size except
      // the two linear passes.
      val words = hashedWords(s, dir)
      val train = words.filter(col("doc_id") % 2 === 0)
      val modelCols = Langs.map(c =>
        sum(when(col("lang") === c, 1).otherwise(0)).as(s"n_$c"))
      val model = Langs.foldLeft(
        train.groupBy("b").agg(modelCols.head, modelCols.tail: _*))(
        (df, c) => df.withColumn(s"l_$c", expr(FixedLog.spark(s"n_$c + 1"))))
      val totCols = Langs.map(c => sum(col(s"n_$c")).as(s"tot_$c"))
      val totals = Langs.foldLeft(model.agg(totCols.head, totCols.tail: _*))(
        (df, c) => df.withColumn(s"nz_$c",
          expr(FixedLog.spark(s"tot_$c + $Buckets"))))
      val priorCols = Langs.map(c =>
        sum(when(col("lang") === c, 1).otherwise(0)).as(s"docs_$c"))
      val priors = Langs.foldLeft(
        Tables(s, dir).documents.filter(col("doc_id") % 2 === 0)
          .agg(priorCols.head, priorCols.tail: _*))(
        (df, c) => df.withColumn(s"pr_$c",
          expr(FixedLog.spark(s"docs_$c + 1"))))
      val scored = words.filter(col("doc_id") % 2 === 1)
        .join(broadcast(model.select("b",
          Langs.map(c => s"l_$c"): _*)), Seq("b"), "left")
        .groupBy("doc_id", "lang")
        .agg(count(lit(1)).as("n_tokens"),
          Langs.map(c => sum(coalesce(col(s"l_$c"), lit(0L))).as(s"s_$c")): _*)
        .crossJoin(broadcast(totals.select(Langs.map(c => col(s"nz_$c")): _*)))
        .crossJoin(broadcast(priors.select(Langs.map(c => col(s"pr_$c")): _*)))
      val withScores = Langs.foldLeft(scored)((df, c) =>
        df.withColumn(s"score_$c",
          col(s"pr_$c") + col(s"s_$c") - col("n_tokens") * col(s"nz_$c")))
      val best = greatest(Langs.map(c => col(s"score_$c")): _*)
      // tie-break: first class in alphabetical order wins
      val pred = Langs.foldRight(lit(Langs.last)) { (c, els) =>
        if (c == Langs.last) els
        else when(col(s"score_$c") === best, lit(c)).otherwise(els)
      }
      withScores
        .withColumn("pred_lang", pred)
        .select(Seq(col("doc_id"), col("lang").as("labeled_lang"),
          col("pred_lang"),
          when(col("pred_lang") === col("labeled_lang"), 1).otherwise(0)
            .as("correct")) ++
          Langs.map(c => col(s"score_$c")): _*)
    }),
    "sel_softdedup" -> ((s, dir) => {
      // SOFT dedup — the reweighting alternative to hard removal
      // (SemDeDup-style): every doc stays in the corpus, but its
      // sampling weight is 1 / |near-dup cluster|, so each distinct
      // content contributes ~one document of probability mass however
      // many times it was crawled. Rides the existing banded-LSH
      // pair generation and cluster machinery; docs outside any pair
      // are their own singleton cluster. Scale shape: everything
      // after the (already scale-audited) clustering is one left
      // join + one groupBy + one join, all keyed on cluster_id; the
      // weight is a single exact IEEE division.
      val docs = Tables(s, dir).documents.select("doc_id")
      val cl = Dedup.clusters(Dedup.minhashLshPairs(Tables(s, dir).documents))
      val withCl = docs.join(cl, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      val sizes = withCl.groupBy("cluster_id")
        .agg(count(lit(1)).as("cluster_size"))
      withCl.join(sizes, Seq("cluster_id"))
        .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
          (lit(1.0) / col("cluster_size")).as("sample_weight"))
    }),
    "sel_curriculum" -> ((s, dir) => {
      // quality-annealed curriculum schedule — the "start clean, end
      // broad" training recipe: within each (lang, source) mixture
      // cell, docs are quality-ranked and enter training at
      //   first_epoch = 1 + floor(E * (rank-1) / cell_n)
      // so the best docs train in every epoch and the noisiest join
      // only in the last; epochs_seen falls out as E - first_epoch + 1.
      // All integer arithmetic after the rank (both engines floor
      // positive integer division identically), and the rank order
      // (score desc, doc_id) is the tx_pref_pairs precedent. Scale
      // shape: ONE shuffle — the per-cell window partition; no global
      // window, no driver state.
      import graft.functions.TextFunctions.qualityScore
      val e = CurriculumEpochs
      val w = Window.partitionBy(col("lang"), col("source"))
        .orderBy(col("score").desc, col("doc_id"))
      Tables(s, dir).documents
        .select(col("doc_id"), col("lang"), col("source"),
          qualityScore(col("text")).as("score"))
        .withColumn("q_rank", row_number().over(w))
        .withColumn("cell_n", count(lit(1)).over(
          Window.partitionBy(col("lang"), col("source"))))
        .select(col("doc_id"), col("lang"), col("source"), col("q_rank"),
          col("cell_n"),
          (expr(s"1 + ($e * (q_rank - 1)) div cell_n")).as("first_epoch"))
        .withColumn("epochs_seen", lit(e) + 1 - col("first_epoch"))
    }),
    "sel_datacard" -> ((s, dir) => {
      // the corpus data card — the per-cell and rolled-up stats every
      // released training set ships with: doc counts, token volume,
      // character volume and mean quality for every (lang, source)
      // cell, every lang, every source, and the whole corpus, in ONE
      // cube shuffle (map-side partial aggs expand the grouping
      // combinations; no second scan). Integer sums + one IEEE
      // division each at the end. The quality mean is averaged on a
      // 2^-20 BINARY grid (floor(q * 2^20) summed as integers): a raw
      // double sum is addition-order-dependent, and the decimal-cast
      // davg rounds DECIMAL half-ties differently across engines —
      // quality scores are binary fractions that land exactly on
      // .xxxx5 (measured: one 33-doc cell at sf0.1 differed in the
      // 5th decimal), where floor on the identical double is
      // unambiguous in both.
      import graft.functions.TextFunctions.qualityScore
      Tables(s, dir).documents
        .select(col("lang"), col("source"),
          size(split(normText(col("text")), " ")).cast("long").as("n_toks"),
          length(col("text")).cast("long").as("n_chars_m"),
          qualityScore(col("text")).as("q"))
        .cube(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_toks")).as("n_tokens"),
          sum(col("n_chars_m")).as("total_chars"),
          (sum(floor(col("q") * 1048576)).cast("double") / lit(1048576.0) /
            count(lit(1))).as("mean_quality"),
          (sum(col("n_toks")).cast("double") / count(lit(1)))
            .as("avg_doc_tokens"))
    }),
    "sel_contrastive_pairs" -> ((s, dir) => {
      // (anchor, positive, negative) triplets for contrastive
      // embedding training: positives are the verified MinHash
      // near-dup pairs (the standard "weak supervision from dedup"
      // trick), negatives are IN-BATCH — each anchor takes the next
      // pair's positive within its deterministic batch group, wrapping
      // at the group end, exactly how in-batch negatives fall out of a
      // training loop. The rare collision where the wrapped negative
      // IS the anchor's own positive is dropped (degenerate triplet).
      // Scale shape: rides the banded LSH pair generation (one keyed
      // shuffle, no cartesian); the windows partition by the batch
      // key, whose group sizes are |pairs|/CpBatches — batches are a
      // semantic grouping, so at corpus scale CpBatches rises with
      // the pair volume the trainer shards.
      val pairs = Dedup.minhashLshPairs(Tables(s, dir).documents)
      val bk = pmod(col("id_a"), lit(CpBatches))
      val w = Window.partitionBy(bk).orderBy(col("id_a"), col("id_b"))
      val wf = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      pairs
        .withColumn("neg",
          coalesce(lead(col("id_b"), 1).over(w), first(col("id_b")).over(wf)))
        .filter(col("neg") =!= col("id_b") && col("neg") =!= col("id_a"))
        .select(col("id_a").as("anchor_id"), col("id_b").as("positive_id"),
          col("neg").as("negative_id"), col("jaccard"))
    }),
    "sel_source_cap" -> ((s, dir) => {
      // source/domain frequency capping — the Gopher/CCNet move
      // against over-represented domains: no source may exceed
      // 1/CapDenom of the corpus, and sources above the cap are
      // downsampled DETERMINISTICALLY by hash rate (keep iff the
      // doc's 16-bit md5 slice falls under the source's threshold
      // floor(cap * CapGrain / n_source)), so the same doc survives
      // on every engine, every cluster size, every rerun. At a FIXED
      // cap, growing a source only lowers its threshold (kept sets
      // shrink monotonically — SelectionProps pins this); corpus-wide
      // growth raises the cap itself and can re-admit docs, which is
      // the point: the cap constrains corpus SHARE, not volume.
      // The cap is rate-exact (binomial in realized count), not
      // rank-exact: the rank version needs a per-source window over
      // the whole corpus (tx_shard's shape, with the skew landing on
      // exactly the over-represented source being capped), while this
      // is two tiny aggregates broadcast against one scan — the doc
      // table itself never shuffles. Long arithmetic holds to ~2^47
      // docs; past that the |sources|-row threshold table moves to
      // DECIMAL with no plan change.
      Tables(s, dir).documents.select(col("doc_id"), col("source"))
        .withColumn("m", capDigestCol(col("doc_id")))
        .withColumn("hv", expr(capHashExpr("m")))
        .join(broadcast(sourceCapThresholds(s, dir)), Seq("source"))
        .select(col("doc_id"), col("source"), col("n_source"), col("thr_fp"),
          when(col("hv") < col("thr_fp"), 1).otherwise(0).as("kept"))
    }),
    "sel_drift" -> ((s, dir) => {
      // corpus drift monitor — PSI-style divergence between two
      // corpus snapshots (the even-doc_id half as the shipped
      // release, the odd half as the incoming batch; the parity
      // split is the sel_nb_langid precedent). Per hashed-unigram
      // bucket, with add-one smoothing over R/N total tokens:
      //   contrib_fp = [(n_ref+1)(N+B) - (n_new+1)(R+B)] * lr_fp
      // where lr_fp is the 1/256-bit fixed-point log2 of the smoothed
      // ratio p_ref(b)/p_new(b). sign(first factor) = sign(p_ref -
      // p_new), so each bucket's term mirrors the PSI integrand
      // (p-q)·log(p/q) — non-negative up to the fixed-point floor —
      // scaled by the constant (R+B)(N+B) to stay in INTEGER
      // arithmetic end to end: drift monitoring compares scores
      // ACROSS runs, so a shared positive scale cancels. Scale shape:
      // one groupBy down to the ≤Buckets-row model table; the log
      // lookups and products touch those rows only. Long-safe while
      // slice-tokens² × lr_fp < 2^63 (~10^8 tokens per slice); past
      // that the 256-row model table moves to DECIMAL.
      val words = hashedWords(s, dir)
      val agg = words.groupBy("b").agg(
        sum(when(col("doc_id") % 2 === 0, 1).otherwise(0)).as("n_ref"),
        sum(when(col("doc_id") % 2 === 1, 1).otherwise(0)).as("n_new"))
      val tot = agg.agg(
        sum(col("n_ref")).as("r_tot"), sum(col("n_new")).as("n_tot"))
      agg.crossJoin(broadcast(tot))
        .withColumn("lr_fp", expr(
          s"CAST(${FixedLog.spark("n_ref + 1")}" +
            s" - ${FixedLog.spark("n_new + 1")}" +
            s" - (${FixedLog.spark(s"r_tot + $Buckets")}" +
            s" - ${FixedLog.spark(s"n_tot + $Buckets")}) AS BIGINT)"))
        .withColumn("contrib_fp",
          ((col("n_ref") + 1) * (col("n_tot") + Buckets) -
            (col("n_new") + 1) * (col("r_tot") + Buckets)) * col("lr_fp"))
        .select("b", "n_ref", "n_new", "lr_fp", "contrib_fp")
    }))

  /** The DSIR model + per-doc scoring shared by `sel_dsir` and the
    * streaming gate's threshold fit: bucket model (≤ Buckets rows,
    * log lookups run here, broadcast), per-doc partial-agg sum of the
    * precomputed integer weights, plus the constant smoothing-
    * denominator term. */
  /** The per-bucket weight model: (b, w_b) with
    * w_b = llog(n_target(b)+1) - llog(n_raw(b)+1). ONE definition —
    * dsirPerDoc (batch join) and dsirCompiled (online array) both
    * read it, so a smoothing/target tweak cannot desynchronize the
    * batch scores from the streaming gate. */
  /** Per-bucket raw counts (b, n_r, n_t) — ≤ Buckets rows, the ONE
    * corpus-tokenizing aggregation the model family shares. Both
    * dsirModelDf and dsirDenomDf build on this exact subplan, so
    * within one executed query Spark's ReuseExchange collapses their
    * two scans into one: the denominator's totals are the column sums
    * of the bucket counts (Σ n_r over buckets IS the corpus token
    * count), which used to be a SECOND full scan + explode + md5 pass
    * over the corpus aggregated to one row. */
  private def dsirBucketCounts(words: DataFrame): DataFrame =
    words.groupBy("b").agg(
      count(lit(1)).as("n_r"),
      sum(when(col("lang") === "en", 1).otherwise(0)).as("n_t"))

  private def dsirModelDf(words: DataFrame): DataFrame =
    dsirBucketCounts(words)
      .withColumn("w_b", expr(
        s"${FixedLog.spark("n_t + 1")} - ${FixedLog.spark("n_r + 1")}"))
      .select("b", "w_b")

  /** The constant smoothing-denominator term, one row: d_fp =
    * llog(R + Buckets) - llog(T + Buckets). Identical values to the
    * direct corpus aggregate (empty corpus included: the sums over
    * zero bucket rows are NULL, and the direct form's t_tot was
    * already NULL there, so d_fp is NULL either way and dsirCompiled's
    * null guard behaves the same). */
  private def dsirDenomDf(words: DataFrame): DataFrame =
    dsirBucketCounts(words).agg(
      sum(col("n_r")).as("r_tot"),
      sum(col("n_t")).as("t_tot"))
      .withColumn("d_fp", expr(
        s"${FixedLog.spark(s"r_tot + $Buckets")} - ${FixedLog.spark(s"t_tot + $Buckets")}"))
      .select("d_fp")

  private[graft] def dsirPerDoc(s: SparkSession, dir: String): DataFrame = {
    val words = hashedWords(s, dir)
    words.join(broadcast(dsirModelDf(words)), Seq("b"))
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_tokens"), sum(col("w_b")).as("_s"))
      .crossJoin(broadcast(dsirDenomDf(words)))
      .withColumn("dsir_fp", col("_s") + col("n_tokens") * col("d_fp"))
      .drop("_s", "d_fp")
  }

  /** Compile the DSIR model for ONLINE serving: the per-bucket weight
    * table as a dense 256-entry array (buckets the reference corpus
    * never hashed into default to weight 0 = llog(1) - llog(1)), the
    * constant denominator term, and the keep threshold (the weight of
    * the DsirK-th ranked doc; the overall min when the corpus is
    * smaller). The three collects are BOUNDED — ≤ Buckets rows, one
    * row, one row — and run once at model-fit time, never per batch:
    * this is the "train offline, bake the model into the serving
    * plan" deployment shape, so the streaming gate scores rows with a
    * pure expression and needs no state store and no join at all. */
  private[graft] def dsirCompiled(s: SparkSession, dir: String)
      : (IndexedSeq[Long], Long, Long) = {
    val words = hashedWords(s, dir)
    val model = dsirModelDf(words)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val weights = (0 until Buckets).map(b => model.getOrElse(b, 0).toLong)
    // empty reference corpus: t_tot's sum over zero rows is NULL (so
    // d_fp is NULL) and no DsirK-th doc exists — there is no selection
    // signal, so the gate admits everything (threshold at Long.MinValue),
    // the same no-history rule as the source-cap gate's unseen source
    val dRow = dsirDenomDf(words).collect().head
    val dFp = if (dRow.isNullAt(0)) 0L else dRow.getInt(0).toLong
    val thrRow = dsirPerDoc(s, dir)
      .orderBy(col("dsir_fp").desc, col("doc_id")).limit(DsirK)
      .agg(min(col("dsir_fp"))).collect().head
    val thr = if (thrRow.isNullAt(0)) Long.MinValue else thrRow.getLong(0)
    (weights, dFp, thr)
  }

  /** The doc's 16-bit hash slice for the source cap, as SQL over a
    * digest column holding md5("srccap:" + doc_id): 4 leading hex
    * digits as an integer in [0, CapGrain). Shared by the batch query
    * and the streaming gate so the keep decision is one definition. */
  private[graft] def capHashExpr(mCol: String): String =
    s"(instr('0123456789abcdef', substr($mCol, 1, 1)) - 1) * 4096" +
      s" + (instr('0123456789abcdef', substr($mCol, 2, 1)) - 1) * 256" +
      s" + (instr('0123456789abcdef', substr($mCol, 3, 1)) - 1) * 16" +
      s" + instr('0123456789abcdef', substr($mCol, 4, 1)) - 1"

  /** The digest column the hash slice reads. */
  private[graft] def capDigestCol(docId: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    md5(concat(lit("srccap:"), docId.cast("string")))

  /** (source, n_source, thr_fp) — ONE definition of the cap model,
    * read by the batch `sel_source_cap` (broadcast join) and the
    * streaming gate's compiled form, so a cap tweak cannot
    * desynchronize offline selection from online serving. */
  private[graft] def sourceCapThresholds(s: SparkSession, dir: String)
      : DataFrame = {
    // NULL-source docs are dropped by both the batch query and the
    // streaming gate's keep predicate; drop them on the FIT side too,
    // else groupBy keeps a null key that the compiled gate's sortBy /
    // map-literal cannot represent (and the model would count docs the
    // serve side never admits)
    val docs = Tables(s, dir).documents
      .filter(col("source").isNotNull)
      .select(col("doc_id"), col("source"))
    val total = docs.agg(count(lit(1)).as("n_total"))
    docs.groupBy("source").agg(count(lit(1)).as("n_source"))
      .crossJoin(broadcast(total))
      // a corpus smaller than CapDenom still admits one doc per
      // source (cap 0 would silently empty it)
      .withColumn("cap", expr(s"greatest(1L, n_total div $CapDenom)"))
      .withColumn("thr_fp",
        when(col("n_source") <= col("cap"), lit(CapGrain.toLong))
          .otherwise(expr(s"(cap * $CapGrain) div n_source")))
      .select("source", "n_source", "thr_fp")
  }

  /** Compile the cap model for ONLINE serving: one bounded collect of
    * the per-source threshold table. Bounded because the capping unit
    * is the corpus' mixture-cell source taxonomy (≤ thousands), the
    * same cardinality every mixing/datacard operator assumes; an
    * open-web domain cap (millions of keys) would instead broadcast-
    * join the threshold TABLE inside foreachBatch rather than bake
    * literals into the expression. */
  private[graft] def sourceCapCompiled(s: SparkSession, dir: String)
      : Seq[(String, Long, Long)] =
    sourceCapThresholds(s, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      .sortBy(_._1)

  /** Row-local scoring expression over a word-array column `ws`:
    * Σ_w weights[bucket(w)] + size(ws) * dFp — the compiled form of
    * dsirPerDoc's join+agg, usable inside a stateless stream. */
  private[graft] def dsirScoreExpr(wsCol: String, weights: IndexedSeq[Long],
                                   dFp: Long): String =
    s"""aggregate(transform($wsCol, w ->
       |    element_at(array(${weights.mkString(", ")}),
       |      (instr('0123456789abcdef', substr(md5(w), 1, 1)) - 1) * 16
       |      + instr('0123456789abcdef', substr(md5(w), 2, 1)))),
       |  0L, (acc, x) -> acc + x) + size($wsCol) * ${dFp}L""".stripMargin

  /** Shared oracle CTE: one row per token with its hashed bucket. */
  private val hashedWordsSql =
    s"""w AS (
       |  SELECT doc_id, lang,
       |         md5(unnest(string_split(${Text.normDuck}, ' '))) AS m
       |  FROM documents),
       |h AS (
       |  SELECT doc_id, lang,
       |         (instr('0123456789abcdef', substr(m, 1, 1)) - 1) * 16
       |         + instr('0123456789abcdef', substr(m, 2, 1)) - 1 AS b
       |  FROM w)""".stripMargin

  /** Oracle CTE chain ending in `per(doc_id, lang, n_tokens, dsir_fp)`
    * — the DSIR model fit + per-doc scoring, shared by the sel_dsir
    * oracle and the streaming gate's (st_sel_gate). */
  private[queries] val dsirPerSql: String =
    s"""$hashedWordsSql,
       |model AS (
       |  SELECT b, CAST(COUNT(*) AS BIGINT) AS n_r,
       |         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_t
       |  FROM h GROUP BY 1),
       |modelw AS (
       |  SELECT b, ${FixedLog.duck("n_t + 1")} - ${FixedLog.duck("n_r + 1")} AS w_b
       |  FROM model),
       |denom AS (
       |  SELECT ${FixedLog.duck(s"CAST(COUNT(*) AS BIGINT) + $Buckets")}
       |         - ${FixedLog.duck(
             s"CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) + $Buckets")}
       |           AS d_fp
       |  FROM h),
       |per AS (
       |  SELECT doc_id, lang, COUNT(*) AS n_tokens,
       |         CAST(SUM(w_b) AS BIGINT) + COUNT(*) * d_fp AS dsir_fp
       |  FROM h JOIN modelw USING (b) CROSS JOIN denom
       |  GROUP BY doc_id, lang, d_fp)""".stripMargin

  /** The streaming gate's keep threshold, as SQL over `per`: weight
    * of the DsirK-th ranked doc, or the overall min on a smaller
    * corpus (then every doc keeps). */
  private[queries] val dsirThresholdSql: String =
    s"""COALESCE(
       |  (SELECT dsir_fp FROM per ORDER BY dsir_fp DESC, doc_id
       |   LIMIT 1 OFFSET ${DsirK - 1}),
       |  (SELECT MIN(dsir_fp) FROM per))""".stripMargin

  val oracles: Map[String, String] = Map(
    "sel_dsir" ->
      s"""WITH $dsirPerSql,
         |top AS (SELECT doc_id, 1 AS _sel FROM per
         |        ORDER BY dsir_fp DESC, doc_id LIMIT $DsirK)
         |SELECT per.doc_id, lang, n_tokens, dsir_fp,
         |       COALESCE(_sel, 0) AS selected
         |FROM per LEFT JOIN top ON per.doc_id = top.doc_id""".stripMargin,
    "sel_nb_langid" ->
      s"""WITH $hashedWordsSql,
         |model AS (
         |  SELECT b,
         |         ${Langs.map(c =>
               s"CAST(SUM(CASE WHEN lang = '$c' THEN 1 ELSE 0 END) AS BIGINT) AS n_$c")
               .mkString(",\n         ")}
         |  FROM h WHERE doc_id % 2 = 0 GROUP BY 1),
         |modell AS (
         |  SELECT b, ${Langs.map(c =>
               s"${FixedLog.duck(s"n_$c + 1")} AS l_$c").mkString(",\n         ")}
         |  FROM model),
         |totals AS (
         |  SELECT ${Langs.map(c =>
               s"${FixedLog.duck(s"CAST(SUM(n_$c) AS BIGINT) + $Buckets")} AS nz_$c")
               .mkString(",\n         ")}
         |  FROM model),
         |priors AS (
         |  SELECT ${Langs.map(c =>
               s"${FixedLog.duck(
                 s"CAST(SUM(CASE WHEN lang = '$c' THEN 1 ELSE 0 END) AS BIGINT) + 1")} AS pr_$c")
               .mkString(",\n         ")}
         |  FROM documents WHERE doc_id % 2 = 0),
         |scored AS (
         |  SELECT doc_id, lang, COUNT(*) AS n_tokens,
         |         ${Langs.map(c =>
               s"CAST(SUM(COALESCE(l_$c, 0)) AS BIGINT) AS s_$c")
               .mkString(",\n         ")}
         |  FROM h LEFT JOIN modell USING (b)
         |  WHERE doc_id % 2 = 1 GROUP BY 1, 2),
         |sc AS (
         |  SELECT doc_id, lang,
         |         ${Langs.map(c =>
               s"pr_$c + s_$c - n_tokens * nz_$c AS score_$c")
               .mkString(",\n         ")}
         |  FROM scored CROSS JOIN totals CROSS JOIN priors)
         |SELECT doc_id, lang AS labeled_lang,
         |       CASE ${Langs.init.map(c =>
             s"WHEN score_$c = greatest(${Langs.map(l => s"score_$l").mkString(", ")}) THEN '$c'")
             .mkString("\n            ")}
         |            ELSE '${Langs.last}' END AS pred_lang,
         |       CASE WHEN (CASE ${Langs.init.map(c =>
             s"WHEN score_$c = greatest(${Langs.map(l => s"score_$l").mkString(", ")}) THEN '$c'")
             .mkString("\n            ")}
         |            ELSE '${Langs.last}' END) = lang THEN 1 ELSE 0 END AS correct,
         |       ${Langs.map(c => s"score_$c").mkString(", ")}
         |FROM sc""".stripMargin,
    "sel_datacard" ->
      s"""WITH d AS (
         |  SELECT lang, source,
         |         CAST(len(string_split(${Text.normDuck}, ' ')) AS BIGINT) AS n_toks,
         |         CAST(length(text) AS BIGINT) AS n_chars_m,
         |         ${Text.scoreDuck}
         |           AS q
         |  FROM documents)
         |SELECT lang, source, COUNT(*) AS n_docs,
         |       CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
         |       CAST(SUM(n_chars_m) AS BIGINT) AS total_chars,
         |       CAST(SUM(CAST(floor(q * 1048576) AS BIGINT)) AS DOUBLE)
         |         / 1048576.0 / COUNT(*) AS mean_quality,
         |       CAST(SUM(n_toks) AS DOUBLE) / COUNT(*) AS avg_doc_tokens
         |FROM d GROUP BY CUBE (lang, source)""".stripMargin,
    "sel_softdedup" ->
      s"""WITH RECURSIVE p AS (
         |  SELECT id_a, id_b FROM (${DedupQueries.minhashPairsSql()}) q),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM p
         |          UNION ALL SELECT id_b, id_a FROM p),
         |reach(id, label) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id),
         |cl AS (SELECT id AS doc_id, MIN(label) AS cluster_id
         |       FROM reach GROUP BY id),
         |wc AS (SELECT d.doc_id, COALESCE(cl.cluster_id, d.doc_id) AS cluster_id
         |       FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id),
         |sz AS (SELECT cluster_id, COUNT(*) AS cluster_size
         |       FROM wc GROUP BY 1)
         |SELECT doc_id, cluster_id, cluster_size,
         |       CAST(1 AS DOUBLE) / cluster_size AS sample_weight
         |FROM wc JOIN sz USING (cluster_id)""".stripMargin,
    "sel_curriculum" ->
      s"""WITH sc AS (
         |  SELECT doc_id, lang, source,
         |         ${Text.scoreDuck}
         |           AS score
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, lang, source,
         |         ROW_NUMBER() OVER (PARTITION BY lang, source
         |                            ORDER BY score DESC, doc_id) AS q_rank,
         |         COUNT(*) OVER (PARTITION BY lang, source) AS cell_n
         |  FROM sc)
         |SELECT doc_id, lang, source, q_rank, cell_n,
         |       1 + ($CurriculumEpochs * (q_rank - 1)) // cell_n AS first_epoch,
         |       $CurriculumEpochs - ($CurriculumEpochs * (q_rank - 1)) // cell_n
         |         AS epochs_seen
         |FROM r""".stripMargin,
    "sel_contrastive_pairs" ->
      s"""WITH pairs_j AS (${DedupQueries.minhashPairsSql()})
         |SELECT id_a AS anchor_id, id_b AS positive_id,
         |       neg AS negative_id, jaccard
         |FROM (
         |  SELECT id_a, id_b, jaccard,
         |         COALESCE(LEAD(id_b) OVER win,
         |                  FIRST_VALUE(id_b) OVER winf) AS neg
         |  FROM pairs_j
         |  WINDOW win AS (PARTITION BY id_a % $CpBatches ORDER BY id_a, id_b),
         |         winf AS (PARTITION BY id_a % $CpBatches ORDER BY id_a, id_b
         |                  ROWS BETWEEN UNBOUNDED PRECEDING
         |                           AND UNBOUNDED FOLLOWING))
         |WHERE neg <> id_b AND neg <> id_a""".stripMargin,
    "sel_source_cap" ->
      s"""WITH t AS (
         |  SELECT greatest(1, CAST(COUNT(*) AS BIGINT) // $CapDenom) AS cap
         |  FROM documents),
         |srcs AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_source
         |  FROM documents GROUP BY 1),
         |thr AS (
         |  SELECT source, n_source,
         |         CASE WHEN n_source <= cap THEN CAST($CapGrain AS BIGINT)
         |              ELSE (cap * $CapGrain) // n_source END AS thr_fp
         |  FROM srcs CROSS JOIN t),
         |hh AS (
         |  SELECT doc_id, source,
         |         (instr('0123456789abcdef', substr(m, 1, 1)) - 1) * 4096
         |         + (instr('0123456789abcdef', substr(m, 2, 1)) - 1) * 256
         |         + (instr('0123456789abcdef', substr(m, 3, 1)) - 1) * 16
         |         + instr('0123456789abcdef', substr(m, 4, 1)) - 1 AS hv
         |  FROM (SELECT doc_id, source,
         |               md5('srccap:' || CAST(doc_id AS VARCHAR)) AS m
         |        FROM documents))
         |SELECT hh.doc_id, hh.source, thr.n_source, thr.thr_fp,
         |       CASE WHEN hv < thr_fp THEN 1 ELSE 0 END AS kept
         |FROM hh JOIN thr USING (source)""".stripMargin,
    "sel_drift" ->
      s"""WITH $hashedWordsSql,
         |agg AS (
         |  SELECT b,
         |         CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
         |              AS BIGINT) AS n_ref,
         |         CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)
         |              AS BIGINT) AS n_new
         |  FROM h GROUP BY 1),
         |tot AS (
         |  SELECT CAST(SUM(n_ref) AS BIGINT) AS r_tot,
         |         CAST(SUM(n_new) AS BIGINT) AS n_tot
         |  FROM agg),
         |lr AS (
         |  SELECT b, n_ref, n_new, r_tot, n_tot,
         |         CAST(${FixedLog.duck("n_ref + 1")}
         |           - ${FixedLog.duck("n_new + 1")}
         |           - (${FixedLog.duck(s"r_tot + $Buckets")}
         |              - ${FixedLog.duck(s"n_tot + $Buckets")})
         |           AS BIGINT) AS lr_fp
         |  FROM agg CROSS JOIN tot)
         |SELECT CAST(b AS INTEGER) AS b, n_ref, n_new, lr_fp,
         |       CAST(((n_ref + 1) * (n_tot + $Buckets)
         |             - (n_new + 1) * (r_tot + $Buckets)) * lr_fp
         |            AS BIGINT) AS contrib_fp
         |FROM lr""".stripMargin)
}
