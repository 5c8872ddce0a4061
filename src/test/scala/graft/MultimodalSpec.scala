package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{Multimodal, StubCodec}

/** The multimodal plumbing is stub-decoded; these specs pin down the
  * parts that are real: schema contract, partitioning, batch shape,
  * and determinism of the codec boundary. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (0L until 100L)
    .map(i => (i, s"payload text number $i with some content"))
    .toDF("doc_id", "text")

  test("media table schema contract: binary payload + typed metadata") {
    val m = Multimodal.mediaTable(docs)
    val types = m.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types("payload") == "binary")
    assert(types("width") == "int" && types("n_frames") == "int")
    assert(types("duration_s") == "double")
    assert(m.select("kind").distinct().count() == 3)
  }

  test("decodeFeatures: one feature row per media row, fixed dim, bounded partitions") {
    val feats = Multimodal.decodeFeatures(Multimodal.mediaTable(docs), partitions = 8)
    assert(feats.rdd.getNumPartitions == 8)
    val rows = feats.collect()
    assert(rows.length == 100)
    assert(rows.forall(_.feature.length == 8))
    assert(rows.forall(r => r.feature.forall(f => f >= 0f && f <= 1f)))
  }

  test("stub codec is deterministic and payload-sensitive") {
    val a = StubCodec.embed("hello".getBytes("UTF-8"))
    val b = StubCodec.embed("hello".getBytes("UTF-8"))
    val c = StubCodec.embed("world".getBytes("UTF-8"))
    assert(a.sameElements(b))
    assert(!a.sameElements(c))
  }

  test("features flow into vector ops (downstream handoff)") {
    val feats = Multimodal.decodeFeatures(Multimodal.mediaTable(docs)).toDF()
    val withNorm = feats.withColumn("norm",
      sqrt(expr("aggregate(feature, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x)")))
    assert(withNorm.filter($"norm" > 0).count() == 100)
  }

  test("codec swap: mm queries route through Multimodal.codec, schema unchanged") {
    val dir = "/root/testdata/sf0.001"
    val run = (q: String) => graft.queries.MultimodalQueries.queries(q)(spark, dir)
    val stubShot = run("mm_shot_boundary")
    val (flatShot, flatVad, flatPhash) = Multimodal.withCodec(FlatCodec) {
      (run("mm_shot_boundary"), run("mm_audio_vad"), run("mm_phash_neardup"))
    }
    // schema identical under either codec — a codec swap is value-only
    assert(flatShot.schema == stubShot.schema)
    // every non-first frame has Hamming 0 under the constant signature
    assert(flatShot.filter($"hamming" =!= 0).count() == 0)
    assert(stubShot.filter($"hamming" =!= 0).count() > 0)
    // constant energy above threshold ⇒ exactly one segment per audio
    val segs = flatVad.groupBy("media_id").count().filter($"count" =!= 1).count()
    assert(segs == 0)
    // identical phash everywhere ⇒ all image pairs are near-dups
    val nImg = Multimodal.mediaTable(
      graft.core.Tables(spark, dir).documents).filter($"kind" === "image").count()
    assert(flatPhash.count() == nImg * (nImg - 1) / 2)
    // and the active codec is restored after withCodec
    assert(Multimodal.codec eq StubCodec)
  }

  test("batched decode uses the active codec's batch session") {
    val feats = Multimodal.withCodec(FlatCodec) {
      Multimodal.decodeFeatures(Multimodal.mediaTable(docs)).collect()
    }
    assert(feats.forall(_.feature.forall(_ == 0.5f)))
  }
}

/** A "real" codec stand-in: different values, same types — proves the
  * queries route through the swap point and that a codec swap is
  * value-only (no plan/schema change). Top-level so the decode
  * closure serializes without dragging the spec class along. */
private object FlatCodec extends graft.multimodal.MediaCodec {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.lit
  def openBatch(): graft.multimodal.MediaCodec.BatchSession =
    new graft.multimodal.MediaCodec.BatchSession {
      def embed(payload: Array[Byte]): Array[Float] = Array.fill(8)(0.5f)
    }
  def phash(payload: Column, mediaId: Column): Column = lit(0L)
  def frameSig(payload: Column, mediaId: Column, frameIdx: Column): Column = lit(7L)
  def frameEnergy(payload: Column, mediaId: Column, frameIdx: Column): Column = lit(50000L)
  def frameDigest(payload: Column, mediaId: Column, frameIdx: Column): Column = lit("flat")
  def thumbDigest(payload: Column, thumbW: Column, thumbH: Column): Column = lit("thumb")
}
