package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media as opaque `binary` payload columns + typed scalar
  * metadata, with decode / feature-extract / frame-sample operators.
  *
  * The decode step is a STUB (no codec libraries in this build): it
  * derives deterministic fake pixels/features from the payload digest.
  * Everything around it is real and is what actually matters at
  * scale — the schema contract, the repartition-before-decode (decode
  * is CPU-bound; parallelism must come from partition count, not file
  * count), the batched `mapPartitions` shape (the JVM analog of
  * `mapInPandas`: amortize per-batch setup, stream without
  * materializing a partition), and the downstream handoff of features
  * into the similarity-search operators. Swapping `StubCodec` for a
  * real JNI/javacpp codec changes no plan shape.
  */
object Multimodal {

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

  /** Batched decode + feature extraction. Repartitions by media_id so
    * decode parallelism tracks cluster cores (not input file layout),
    * then streams 64-element batches through the codec — the exact
    * shape a `mapInPandas`/Arrow pipeline has in PySpark. */
  def decodeFeatures(media: DataFrame, partitions: Int = 0): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    val nParts = if (partitions > 0) partitions
                 else spark.sparkContext.defaultParallelism
    media
      .repartition(nParts, col("media_id"))
      .select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(64).flatMap { batch =>
          // per-batch codec setup would happen here (model load, etc.)
          batch.map { case (id, kind, payload) =>
            MediaFeature(id, kind, payload.length, StubCodec.embed(payload))
          }
        }
      }
  }
}

/** STUB codec — deterministic fakes standing in for image/audio
  * decoding (no codec libs in this environment). Every function is a
  * pure digest-derived value so tests and oracles are reproducible. */
object StubCodec {
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
