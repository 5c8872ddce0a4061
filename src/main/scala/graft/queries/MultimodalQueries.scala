package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.multimodal.Multimodal

/** Multimodal surface: catalog (scalar metadata — oracle-checked),
  * deterministic frame sampling (oracle-checked), and the batched
  * decode/feature pipeline (stub codec — rows-only + ScalaTest). */
object MultimodalQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "mm_catalog" -> ((s, dir) =>
      Multimodal.mediaTable(Tables(s, dir).documents)
        .select(col("media_id"), col("kind"),
          length(col("payload")).as("n_bytes"),
          col("width"), col("height"), col("n_frames"), col("duration_s"),
          md5(col("payload")).as("payload_md5"))),
    // aspect-preserving thumbnail fit into 256×256 (no upscale): the
    // dimension math is the real operator; the raster is the STUB
    // digest of (content, target dims) — a real codec swaps in there
    // with no plan change.
    "mm_resize" -> ((s, dir) => {
      val m = Multimodal.mediaTable(Tables(s, dir).documents)
        .filter(col("kind") === "image")
        .withColumn("scale",
          least(lit(1.0), least(lit(256.0) / col("width"), lit(256.0) / col("height"))))
        .withColumn("thumb_w",
          greatest(lit(1), floor(col("width") * col("scale"))).cast("int"))
        .withColumn("thumb_h",
          greatest(lit(1), floor(col("height") * col("scale"))).cast("int"))
      m.select(col("media_id"), col("width"), col("height"),
        col("thumb_w"), col("thumb_h"),
        Multimodal.codec.thumbDigest(col("payload"),
          col("thumb_w"), col("thumb_h")).as("thumb_md5"))
    }),
    // perceptual-hash near-duplicate detection over the image catalog —
    // the re-encode/resize dedup pass an image training corpus needs
    // (byte-exact mm_dedup can't see a JPEG quality change). The
    // 60-bit pHash comes from the active MediaCodec (stub: digest of a
    // planted source-group key with per-image single-bit "artifact"
    // flips; a real DCT pHash swaps in via Multimodal.withCodec with
    // no plan change), because the OPERATOR is the banded blocking:
    // 4 bands × 15 bits as the candidate equi-join key. Any pair
    // within Hamming ≤ 2 shares ≥ 2 intact bands (2 flipped bits can
    // spoil at most 2 of 4 — the pigeonhole guarantee), so banding
    // finds EVERY such pair and the exact bit_count verify discards
    // band-collision noise: the banded plan is provably ≡ the
    // all-pairs scan the oracle runs, at equi-join cost. No payload
    // ever shuffles — signatures only.
    // Near-dup images by banded pHash, in SIGNATURE space first: LSH
    // bands join over the DISTINCT hashes, and only hash pairs that
    // survive hamming<=2 expand back to id pairs. This makes the
    // operator's cost Θ(distinct-hash LSH) + Θ(OUTPUT rows) — the
    // unavoidable minimum — instead of Θ(Σ bucket² over ids): the
    // 100× rehearsal measured 167k images collapsing to 1,067
    // distinct hashes (perceptual signatures are low-entropy on
    // repetitive corpora by design — that's what makes them near-dup
    // detectors), so id-space banding built 445M candidate pairs to
    // keep a 39M-row answer, 352 s; signature-space banding builds
    // ~0.5M. With high-entropy signatures distinct≈n and this is the
    // same LSH plan as banding ids directly — strictly no worse.
    // Recall is exact either way: <=2 differing bits leave >=2 of the
    // four 15-bit bands intact (bits 60-63 disturb none), so every
    // hamming<=2 hash pair shares a band.
    "mm_phash_neardup" -> ((s, dir) => {
      val sig = Multimodal.mediaTable(Tables(s, dir).documents)
        .filter(col("kind") === "image")
        .withColumn("phash",
          Multimodal.codec.phash(col("payload"), col("media_id")))
        .select(col("media_id"), col("phash"))
      val hashes = sig.select(col("phash")).distinct()
      val bandedH = hashes.select(col("phash"),
          explode(expr("array(0, 1, 2, 3)")).as("band_idx"))
        .withColumn("band_val",
          expr("shiftrightunsigned(phash, 15 * band_idx) & 32767"))
      // first-shared-band filter dedups pairs that collide in 2+
      // bands WITHOUT a distinct exchange (both hashes' earlier band
      // values re-derive by bit arithmetic — row-local, codegen'd)
      val noEarlierBand = (0 until 4).map(j =>
        when(col("band_idx") > j,
          expr(s"shiftrightunsigned(ph_a, ${15 * j}) & 32767") =!=
            expr(s"shiftrightunsigned(ph_b, ${15 * j}) & 32767"))
          .otherwise(lit(true))).reduce(_ && _)
      val hashPairs = bandedH
        .select(col("band_idx"), col("band_val"), col("phash").as("ph_a"))
        .join(bandedH.select(col("band_idx"), col("band_val"),
          col("phash").as("ph_b")), Seq("band_idx", "band_val"))
        .filter(col("ph_a") < col("ph_b"))
        .filter(noEarlierBand)
        .select(col("ph_a"), col("ph_b"))
        .withColumn("hamming",
          expr("cast(bit_count(ph_a ^ ph_b) as int)"))
        .filter(col("hamming") <= 2)
      // expansion joins produce exactly the output rows; hamming-0
      // pairs come from the within-group self-join (same hash)
      val cross = hashPairs
        .join(sig.select(col("phash").as("ph_a"),
          col("media_id").as("ida")), Seq("ph_a"))
        .join(sig.select(col("phash").as("ph_b"),
          col("media_id").as("idb")), Seq("ph_b"))
        .select(least(col("ida"), col("idb")).as("id_a"),
          greatest(col("ida"), col("idb")).as("id_b"), col("hamming"))
      val same = sig.select(col("phash"), col("media_id").as("id_a"))
        .join(sig.select(col("phash"), col("media_id").as("id_b")),
          Seq("phash"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          lit(0).cast("int").as("hamming"))
      cross.unionByName(same)
    }),
    // shot-boundary detection over the sampled frames: a cut is
    // declared where consecutive frames' 32-bit perceptual signatures
    // differ in more than half their bits (Hamming > 16). The frame
    // signature comes from the active MediaCodec (stub: leading 32
    // bits of the frame digest; a real pHash/dHash swaps in via
    // Multimodal.withCodec with no plan change): the operator IS the
    // per-video lag window (partitioned by media_id, tiny ordered
    // partitions, fully parallel across videos) + a codegen'd
    // xor/bit_count; no shuffle beyond the one window partitioning,
    // payloads never move.
    "mm_shot_boundary" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("media_id")).orderBy(col("frame_idx"))
      val frames = Multimodal.mediaTable(Tables(s, dir).documents)
        .filter(col("kind") === "video")
        .withColumn("step", greatest(expr("n_frames div 4"), lit(1)))
        .select(col("media_id"), col("payload"),
          explode(expr("sequence(0, n_frames - 1, step)")).as("frame_idx"))
        .withColumn("fsig",
          Multimodal.codec.frameSig(col("payload"), col("media_id"), col("frame_idx")))
        .drop("payload")
      frames
        .withColumn("prev_sig", lag(col("fsig"), 1).over(w))
        .withColumn("hamming",
          bit_count(expr("fsig ^ prev_sig")).cast("int"))
        .withColumn("is_cut", coalesce(col("hamming") > 16, lit(false)))
        .select("media_id", "frame_idx", "hamming", "is_cut")
    }),
    // voice-activity segmentation over the audio tracks — the VAD →
    // segment step a speech pipeline runs before ASR/filtering: a
    // per-frame energy from the active MediaCodec (stub: the frame
    // digest's leading 16 bits; a real codec computes RMS over PCM
    // windows — same plumbing),
    // thresholded, and contiguous active runs become segments via
    // gaps-and-islands (frame_idx minus active-rank is constant
    // within a run). Scale shape: one explode → one window per media
    // (partitioned by media_id) → one bounded per-run groupBy;
    // O(frames) rows end to end, no joins.
    "mm_audio_vad" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("media_id")).orderBy(col("frame_idx"))
      val active = Multimodal.mediaTable(Tables(s, dir).documents)
        .filter(col("kind") === "audio")
        .select(col("media_id"), col("payload"),
          explode(expr("sequence(0, n_frames - 1)")).as("frame_idx"))
        .withColumn("energy",
          Multimodal.codec.frameEnergy(col("payload"), col("media_id"), col("frame_idx")))
        .drop("payload")
        .filter(col("energy") > 40000)
      active
        .withColumn("grp", col("frame_idx") - row_number().over(w))
        .groupBy(col("media_id"), col("grp"))
        .agg(min(col("frame_idx")).as("seg_start"),
          max(col("frame_idx")).as("seg_end"),
          count(lit(1)).as("n_active"))
        .withColumn("seg_idx", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("media_id")).orderBy(col("seg_start"))))
        .select("media_id", "seg_idx", "seg_start", "seg_end", "n_active")
    }),
    // deterministic frame sampling: ~4 evenly spaced frames per video.
    "mm_frame_sample" -> ((s, dir) => {
      val m = Multimodal.mediaTable(Tables(s, dir).documents)
        .filter(col("kind") === "video")
        .withColumn("step", greatest(expr("n_frames div 4"), lit(1)))
      m.select(col("media_id"), col("payload"), col("n_frames"),
          explode(expr("sequence(0, n_frames - 1, step)")).as("frame_idx"))
        .withColumn("frame_md5",
          // codec decode: stub emits the digest of (media digest,
          // frame index); a real decoder emits the frame raster here.
          Multimodal.codec.frameDigest(col("payload"), col("media_id"), col("frame_idx")))
        .drop("payload")
    }),
    // the checked projection renders the float feature vector as its
    // exact u16 fold values (feature = u16/65535f, lossless round-trip
    // for 16-bit values in float32): scalar columns keep the driver's
    // pandas comparator happy AND make the decode pipeline
    // oracle-checkable end to end. The array form stays available via
    // Multimodal.decodeFeatures for downstream similarity search.
    "mm_features" -> ((s, dir) => {
      import s.implicits._
      Multimodal.decodeFeatures(Multimodal.mediaTable(Tables(s, dir).documents))
        .map(f => (f.media_id, f.kind, f.n_bytes, f.feature.length,
          f.feature.map(x => Math.round(x * 65535f)).mkString(",")))
        .toDF("media_id", "kind", "n_bytes", "feature_dim", "feature_u16")
    }),
    // contrastive (text, image) training-pair construction — the
    // collate step of CLIP-style pretraining, distributed: every
    // caption and every image is hash-assigned to one of 256 batches
    // (first two md5 hex digits of its id — the same engine-portable
    // bucket tx_split uses), and one equi-join on the batch key emits
    // the full in-batch pair grid: the (doc, its own image) positives
    // land in the same batch by construction (same id ⇒ same hash),
    // every other in-batch pair is a negative — exactly the
    // contrastive denominator. The O(batch²) fan-out is the
    // OPERATOR'S semantics, bounded by batch size: at corpus scale
    // the bucket count grows with the data (more hex digits), the
    // same knob as the banded LSH joins, keeping E[batch] constant.
    // Payloads never move — ids and batch keys only.
    "mm_text_image_pairs" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
        .withColumn("m", md5(col("doc_id").cast("string")))
        .select(col("doc_id"),
          (expr("instr('0123456789abcdef', substr(m, 1, 1)) - 1") * 16 +
           expr("instr('0123456789abcdef', substr(m, 2, 1)) - 1"))
            .cast("int").as("batch"))
      val imgs = Multimodal.mediaTable(Tables(s, dir).documents)
        .filter(col("kind") === "image")
        .withColumn("m", md5(col("media_id").cast("string")))
        .select(col("media_id"),
          (expr("instr('0123456789abcdef', substr(m, 1, 1)) - 1") * 16 +
           expr("instr('0123456789abcdef', substr(m, 2, 1)) - 1"))
            .cast("int").as("batch"))
      docs.join(imgs, Seq("batch"))
        .select(col("batch"), col("doc_id"), col("media_id"),
          (col("doc_id") === col("media_id")).as("is_pos"))
    }),
    // byte-level content dedup — the first gate of any media pipeline
    // (identical files arrive via N crawls/mirrors): group by payload
    // digest, keep the smallest id. Only (digest, id) rows shuffle;
    // the binary payloads never move.
    "mm_dedup" -> ((s, dir) =>
      Multimodal.mediaTable(Tables(s, dir).documents)
        .select(col("media_id"), md5(col("payload")).as("content_digest"))
        .groupBy(col("content_digest"))
        .agg(min(col("media_id")).as("keep_id"),
             count(lit(1)).as("n_copies"))))

  val oracles: Map[String, String] = Map(
    // the oracle runs the ALL-PAIRS Hamming scan the banded plan is
    // provably equivalent to — a stronger check than mirroring the
    // banding (a banding bug that loses pairs cannot also hide here).
    "mm_phash_neardup" ->
      """WITH img AS (SELECT doc_id AS media_id FROM documents WHERE doc_id % 3 = 0),
        |hx AS (SELECT media_id, md5(CAST(media_id % 97 AS VARCHAR)) AS fh FROM img),
        |b AS (
        |  SELECT media_id,
        |         CAST(SUM((strpos('0123456789abcdef',
        |                          substr(fh, CAST(i AS INTEGER) + 1, 1)) - 1)
        |             * (CAST(1 AS BIGINT) << CAST(4 * (14 - i) AS INTEGER)))
        |           AS BIGINT) AS base
        |  FROM hx, range(0, 15) t(i)
        |  GROUP BY media_id),
        |h AS (
        |  SELECT media_id,
        |         CASE WHEN media_id % 2 = 0
        |              THEN xor(base, CAST(1 AS BIGINT) << CAST(media_id % 60 AS INTEGER))
        |              ELSE base END AS phash
        |  FROM b)
        |SELECT a.media_id AS id_a, b2.media_id AS id_b,
        |       CAST(bit_count(xor(a.phash, b2.phash)) AS INTEGER) AS hamming
        |FROM h a JOIN h b2 ON a.media_id < b2.media_id
        |WHERE bit_count(xor(a.phash, b2.phash)) <= 2""".stripMargin,
    "mm_text_image_pairs" ->
      """WITH b AS (
        |  SELECT doc_id,
        |         CAST((instr('0123456789abcdef',
        |                     substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
        |              + (instr('0123456789abcdef',
        |                       substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
        |           AS INTEGER) AS batch
        |  FROM documents),
        |imgs AS (SELECT doc_id AS media_id, batch FROM b WHERE doc_id % 3 = 0)
        |SELECT b.batch, b.doc_id, imgs.media_id,
        |       b.doc_id = imgs.media_id AS is_pos
        |FROM b JOIN imgs ON b.batch = imgs.batch""".stripMargin,
    "mm_dedup" ->
      """SELECT md5(text) AS content_digest,
        |       MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,
    "mm_resize" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |         CAST(64 + (doc_id % 16) * 32 AS INTEGER) AS width,
        |         CAST(64 + (doc_id % 9) * 32 AS INTEGER) AS height,
        |         text
        |  FROM documents WHERE doc_id % 3 = 0),
        |s AS (
        |  SELECT *, least(1.0, least(256.0 / width, 256.0 / height)) AS scale
        |  FROM m),
        |t AS (
        |  SELECT media_id, width, height, text,
        |         greatest(1, CAST(floor(width * scale) AS INTEGER)) AS thumb_w,
        |         greatest(1, CAST(floor(height * scale) AS INTEGER)) AS thumb_h
        |  FROM s)
        |SELECT media_id, width, height, thumb_w, thumb_h,
        |       md5(md5(text) || ':' || thumb_w || 'x' || thumb_h) AS thumb_md5
        |FROM t""".stripMargin,
    "mm_catalog" ->
      """SELECT doc_id AS media_id,
        |       CASE WHEN doc_id % 3 = 0 THEN 'image'
        |            WHEN doc_id % 3 = 1 THEN 'audio'
        |            ELSE 'video' END AS kind,
        |       octet_length(encode(text)) AS n_bytes,
        |       CAST(64 + (doc_id % 16) * 32 AS INTEGER) AS width,
        |       CAST(64 + (doc_id % 9) * 32 AS INTEGER) AS height,
        |       CAST(8 + doc_id % 120 AS INTEGER) AS n_frames,
        |       (8 + doc_id % 120) / 24.0 AS duration_s,
        |       md5(text) AS payload_md5
        |FROM documents""".stripMargin,
    "mm_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |         CAST(8 + doc_id % 120 AS INTEGER) AS n_frames,
        |         greatest((8 + doc_id % 120) // 4, 1) AS step
        |  FROM documents WHERE doc_id % 3 = 2)
        |SELECT media_id, n_frames, unnest(range(0, n_frames, step)) AS frame_idx,
        |       md5(md5(CAST(media_id AS VARCHAR)) || ':' || frame_idx) AS frame_md5
        |FROM m""".stripMargin,
    // reproduce the frame signature (leading 8 hex nibbles of the
    // frame digest) in SQL, then the same lag/xor/popcount window.
    "mm_shot_boundary" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |         CAST(8 + doc_id % 120 AS INTEGER) AS n_frames,
        |         greatest((8 + doc_id % 120) // 4, 1) AS step
        |  FROM documents WHERE doc_id % 3 = 2),
        |fr AS (
        |  SELECT media_id, unnest(range(0, n_frames, step)) AS frame_idx FROM m),
        |h AS (
        |  SELECT media_id, frame_idx,
        |         md5(md5(CAST(media_id AS VARCHAR)) || ':' || frame_idx) AS fh
        |  FROM fr),
        |sig AS (
        |  SELECT media_id, frame_idx,
        |         CAST(SUM((strpos('0123456789abcdef',
        |                          substr(fh, CAST(i AS INTEGER) + 1, 1)) - 1)
        |             * (CAST(1 AS BIGINT) << CAST(4 * (7 - i) AS INTEGER)))
        |           AS BIGINT) AS fsig
        |  FROM h, range(0, 8) t(i)
        |  GROUP BY media_id, frame_idx),
        |lg AS (
        |  SELECT media_id, frame_idx, fsig,
        |         lag(fsig) OVER (PARTITION BY media_id ORDER BY frame_idx)
        |           AS prev_sig
        |  FROM sig)
        |SELECT media_id, frame_idx,
        |       CAST(bit_count(xor(fsig, prev_sig)) AS INTEGER) AS hamming,
        |       coalesce(bit_count(xor(fsig, prev_sig)) > 16, FALSE) AS is_cut
        |FROM lg""".stripMargin,
    // same digest-energy recipe as the Spark side, then the identical
    // gaps-and-islands segmentation.
    "mm_audio_vad" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, CAST(8 + doc_id % 120 AS INTEGER) AS n_frames
        |  FROM documents WHERE doc_id % 3 = 1),
        |fr AS (
        |  SELECT media_id, unnest(range(0, n_frames)) AS frame_idx FROM m),
        |en AS (
        |  SELECT media_id, frame_idx,
        |         CAST(SUM((strpos('0123456789abcdef',
        |                  substr(md5(md5(CAST(media_id AS VARCHAR)) || ':' || frame_idx),
        |                         CAST(i AS INTEGER) + 1, 1)) - 1)
        |             * (CAST(1 AS BIGINT) << CAST(4 * (3 - i) AS INTEGER)))
        |           AS BIGINT) AS energy
        |  FROM fr, range(0, 4) t(i)
        |  GROUP BY media_id, frame_idx),
        |act AS (
        |  SELECT media_id, frame_idx,
        |         ROW_NUMBER() OVER (PARTITION BY media_id ORDER BY frame_idx) AS rn
        |  FROM en WHERE energy > 40000),
        |seg AS (
        |  SELECT media_id, MIN(frame_idx) AS seg_start, MAX(frame_idx) AS seg_end,
        |         COUNT(*) AS n_active
        |  FROM (SELECT media_id, frame_idx, frame_idx - rn AS grp FROM act)
        |  GROUP BY media_id, grp)
        |SELECT media_id,
        |       ROW_NUMBER() OVER (PARTITION BY media_id ORDER BY seg_start) AS seg_idx,
        |       seg_start, seg_end, n_active
        |FROM seg""".stripMargin,
    // the stub features are md5-digest u16 folds; re-derive them in SQL
    // by parsing each 4-hex-char chunk of md5(text).
    "mm_features" ->
      """WITH f AS (
        |  SELECT doc_id AS media_id,
        |         CASE WHEN doc_id % 3 = 0 THEN 'image'
        |              WHEN doc_id % 3 = 1 THEN 'audio'
        |              ELSE 'video' END AS kind,
        |         CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |         md5(text) AS h
        |  FROM documents
        |  WHERE text IS NOT NULL),
        |u AS (
        |  SELECT media_id, kind, n_bytes, i,
        |         (strpos('0123456789abcdef', substr(h, 4*i+1, 1)) - 1) * 4096
        |       + (strpos('0123456789abcdef', substr(h, 4*i+2, 1)) - 1) * 256
        |       + (strpos('0123456789abcdef', substr(h, 4*i+3, 1)) - 1) * 16
        |       + (strpos('0123456789abcdef', substr(h, 4*i+4, 1)) - 1) AS v
        |  FROM f, generate_series(0, 7) g(i))
        |SELECT media_id, kind, n_bytes, CAST(8 AS INTEGER) AS feature_dim,
        |       string_agg(CAST(v AS VARCHAR), ',' ORDER BY i) AS feature_u16
        |FROM u GROUP BY media_id, kind, n_bytes""".stripMargin)
}
