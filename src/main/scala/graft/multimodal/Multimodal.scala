package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media as opaque `binary` payload columns + typed scalar
  * metadata, with decode / feature-extract / frame-sample operators.
  *
  * The decode step is pluggable via [[MediaCodec]] and STUBBED by
  * default (no codec libraries in this build): [[StubCodec]] derives
  * deterministic fake pixels/features from the payload digest.
  * Everything around it is real and is what actually matters at
  * scale — the schema contract, the repartition-before-decode (decode
  * is CPU-bound; parallelism must come from partition count, not file
  * count), the batched `mapPartitions` shape (the JVM analog of
  * `mapInPandas`: amortize per-batch setup, stream without
  * materializing a partition), and the downstream handoff of features
  * into the similarity-search operators. Swapping [[StubCodec]] for a
  * real JNI/javacpp codec changes no plan shape.
  */
object Multimodal {

  /** The active codec — the single swap point the multimodal queries
    * route through. Replace with a real implementation (JNI decoder +
    * DCT pHash + PCM energy) via [[withCodec]]; every `mm_*` query
    * picks it up with zero plan-shape change, because the queries only
    * ever consume the codec's Columns/rows, never its internals. */
  @volatile var codec: MediaCodec = StubCodec

  /** Run `body` with `c` installed as the active codec (test/deploy
    * hook); restores the previous codec afterwards. */
  def withCodec[A](c: MediaCodec)(body: => A): A = {
    val prev = codec
    codec = c
    try body finally { codec = prev }
  }

  /** Media catalog synthesized deterministically from `documents`:
    * payload = utf-8 bytes, kind round-robins image/audio/video, and
    * the typed metadata every real media table carries. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      col("text").cast("binary").as("payload"),
      (lit(64) + (col("doc_id") % 16) * 32).cast("int").as("width"),
      (lit(64) + (col("doc_id") % 9) * 32).cast("int").as("height"),
      (lit(8) + col("doc_id") % 120).cast("int").as("n_frames"),
      ((lit(8) + col("doc_id") % 120) / 24.0).as("duration_s"))

  final case class MediaFeature(
    media_id: Long, kind: String, n_bytes: Int, feature: Array[Float])

  /** Batched decode + feature extraction through the given codec.
    * Repartitions by media_id so decode parallelism tracks cluster
    * cores (not input file layout), then streams 64-element batches
    * through the codec — the exact shape a `mapInPandas`/Arrow
    * pipeline has in PySpark. */
  def decodeFeatures(media: DataFrame, partitions: Int = 0,
                     codec: MediaCodec = Multimodal.codec): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    val nParts = if (partitions > 0) partitions
                 else spark.sparkContext.defaultParallelism
    media
      .repartition(nParts, col("media_id"))
      .select(col("media_id"), col("kind"), col("payload"))
      // a record without bytes has nothing to decode — drop it here
      // (the catalog keeps it; only the feature path needs a payload)
      .filter(col("payload").isNotNull)
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(64).flatMap { batch =>
          // per-batch codec setup happens once per 64 rows (model
          // load, decoder context) — that is what the grouping buys.
          val session = codec.openBatch()
          batch.map { case (id, kind, payload) =>
            MediaFeature(id, kind, payload.length, session.embed(payload))
          }
        }
      }
  }
}

/** The codec interface every multimodal operator programs against.
  *
  * Two layers, matching the two ways media math enters a Spark plan:
  *
  *  - '''Column-level signatures''' (`phash`, `frameSig`,
  *    `frameEnergy`, `thumbDigest`): plan-side expressions over the
  *    payload/metadata columns. The stub computes digest-derived
  *    fakes with built-in codegen'd functions; a real codec supplies
  *    its own expression (native Catalyst `Expression` or a UDF over
  *    the decoded raster). Either way the OPERATORS around them —
  *    banded Hamming blocking, lag-window shot detection,
  *    gaps-and-islands VAD — are codec-agnostic: same plan shape,
  *    same shuffle keys, payloads still never move.
  *  - '''Row-level decode''' (`openBatch().embed`): executor-side,
  *    called from `Multimodal.decodeFeatures`'s batched
  *    `mapPartitions`. `openBatch()` is the per-batch setup hook
  *    (decoder context / model load) a real codec amortizes.
  */
trait MediaCodec extends Serializable {

  /** Per-batch decode session; created once per 64-row batch. */
  def openBatch(): MediaCodec.BatchSession

  /** Perceptual hash of an image (60-bit long). A real impl decodes
    * the payload and runs DCT; the stub derives it from the media id
    * (payload is accepted so the real impl needs no signature change). */
  def phash(payload: Column, mediaId: Column): Column

  /** Per-frame perceptual signature of a video (32-bit long). The
    * payload rides along so a real decoder can read actual frames;
    * callers project the signature (and drop the payload) BEFORE any
    * shuffle, so payloads still never move. */
  def frameSig(payload: Column, mediaId: Column, frameIdx: Column): Column

  /** Per-frame audio energy (16-bit long; real impl: RMS over PCM). */
  def frameEnergy(payload: Column, mediaId: Column, frameIdx: Column): Column

  /** Content digest of one decoded frame (real impl: hash of the
    * frame raster a real decoder emits). */
  def frameDigest(payload: Column, mediaId: Column, frameIdx: Column): Column

  /** Digest of the thumbnail raster at (w × h). A real impl decodes,
    * resizes, and hashes the pixels; the stub hashes (content, dims). */
  def thumbDigest(payload: Column, thumbW: Column, thumbH: Column): Column
}

object MediaCodec {
  trait BatchSession {
    /** Feature embedding of one payload (decode → preprocess → encode). */
    def embed(payload: Array[Byte]): Array[Float]
  }
}

/** STUB codec — deterministic digest-derived fakes standing in for
  * image/audio decoding (no codec libs in this environment). Every
  * value is a pure function of the inputs so tests and the DuckDB
  * oracles replay them exactly. */
object StubCodec extends MediaCodec {

  def openBatch(): MediaCodec.BatchSession = Batch

  private object Batch extends MediaCodec.BatchSession {
    private def digest(bytes: Array[Byte]): Array[Byte] =
      java.security.MessageDigest.getInstance("MD5").digest(bytes)

    /** STUB feature extractor: 8 floats folded from the md5 digest.
      * Real impl: decode → preprocess → encoder forward pass. */
    def embed(payload: Array[Byte]): Array[Float] = {
      val d = digest(payload)
      (0 until 8).map { i =>
        ((d(2 * i) & 0xff) * 256 + (d(2 * i + 1) & 0xff)) / 65535.0f
      }.toArray
    }
  }

  /** Row-level embed kept callable for specs. */
  def embed(payload: Array[Byte]): Array[Float] = Batch.embed(payload)

  /** 60-bit pHash: base bits from the md5 of a planted source-group
    * key (media_id % 97 — so re-encodes of the same source share
    * bits), with per-image single-bit "artifact" flips. */
  def phash(payload: Column, mediaId: Column): Column = {
    val base = conv(substring(md5((mediaId % 97).cast("string")), 1, 15), 16, 10)
      .cast("long")
    when(mediaId % 2 === 0,
      call_function("shiftleft", lit(1L), (mediaId % 60).cast("int")).bitwiseXOR(base))
      .otherwise(base)
  }

  /** Leading 32 bits of the frame digest (payload unused — stub). */
  def frameSig(payload: Column, mediaId: Column, frameIdx: Column): Column =
    conv(substring(frameDigest(payload, mediaId, frameIdx), 1, 8), 16, 10)
      .cast("long")

  /** Leading 16 bits of the frame digest (payload unused — stub). */
  def frameEnergy(payload: Column, mediaId: Column, frameIdx: Column): Column =
    conv(substring(frameDigest(payload, mediaId, frameIdx), 1, 4), 16, 10)
      .cast("long")

  /** Digest of (media digest, frame index) — payload unused (stub). */
  def frameDigest(payload: Column, mediaId: Column, frameIdx: Column): Column =
    md5(concat(md5(mediaId.cast("string")), lit(":"), frameIdx))

  /** md5 of (content digest, target dims). */
  def thumbDigest(payload: Column, thumbW: Column, thumbH: Column): Column =
    md5(concat(md5(payload), lit(":"),
      thumbW.cast("string"), lit("x"), thumbH.cast("string")))
}
