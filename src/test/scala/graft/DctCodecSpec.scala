package graft

import graft.multimodal.{DctCodec, Multimodal}

/** The real-algorithm codec on the MediaCodec seam: DCT pHash
  * properties + drop-in behavior on the mm queries. */
class DctCodecSpec extends SparkSpec {

  test("DCT pHash: identical equal, near-dup close, unrelated far") {
    val a = ("the quick brown fox jumps over the lazy dog and keeps " +
      "running through the open field towards the river").getBytes("UTF-8")
    val b = a.clone(); b(10) = 'x'.toByte
    val c = ("completely different content with nothing shared at all " +
      "zzz qqq www mmm kkk blorp").getBytes("UTF-8")
    val (ha, hb, hc) = (DctCodec.hash64(a, 0), DctCodec.hash64(b, 0), DctCodec.hash64(c, 0))
    assert(ha == DctCodec.hash64(a.clone(), 0))
    val hamAb = java.lang.Long.bitCount(ha ^ hb)
    val hamAc = java.lang.Long.bitCount(ha ^ hc)
    assert(hamAb < hamAc, s"one-byte edit ($hamAb bits) not closer than unrelated ($hamAc)")
  }

  test("frame signatures vary by frame (offset actually reaches the raster)") {
    val p = "some video payload bytes for frame windows".getBytes("UTF-8")
    val sigs = (0L to 3L).map(i => DctCodec.hash64(p, i * 32 * 32) & 0xffffffffL)
    // the payload length (42) is coprime-ish to the raster stride, so
    // different offsets tile different pixels — if hash64 ignored the
    // offset every signature would collapse to one value and
    // mm_shot_boundary could never see a cut under this codec
    assert(sigs.distinct.size > 1, sigs.toString)
  }

  test("mm queries run under DctCodec with identical schemas") {
    val dir = "/root/testdata/sf0.001"
    val run = (q: String) => graft.queries.MultimodalQueries.queries(q)(spark, dir)
    for (q <- Seq("mm_resize", "mm_shot_boundary", "mm_audio_vad", "mm_frame_sample")) {
      val stub = run(q)
      val real = Multimodal.withCodec(DctCodec)(run(q))
      assert(real.schema == stub.schema, s"$q schema changed under codec swap")
      assert(real.count() > 0, s"$q empty under DctCodec")
    }
  }

  test("decodeFeatures under DctCodec: deterministic (0,1) features") {
    import spark.implicits._
    val docs = (0L until 50L)
      .map(i => (i, s"document body number $i with content to hash")).toDF("doc_id", "text")
    val f1 = Multimodal.withCodec(DctCodec) {
      Multimodal.decodeFeatures(Multimodal.mediaTable(docs)).collect()
    }.map(f => f.media_id -> f.feature.toSeq).toMap
    assert(f1.values.forall(v => v.length == 8 && v.forall(x => x > 0f && x < 1f)))
    val f2 = Multimodal.withCodec(DctCodec) {
      Multimodal.decodeFeatures(Multimodal.mediaTable(docs)).collect()
    }.map(f => f.media_id -> f.feature.toSeq).toMap
    assert(f1 == f2)
  }
}
