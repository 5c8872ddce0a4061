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
}
