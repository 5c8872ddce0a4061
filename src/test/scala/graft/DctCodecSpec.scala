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

  /** Hand-assemble a 24-bpp BI_RGB BMP: 54-byte header + bottom-up
    * padded BGR rows — every byte placed by this spec, no library. */
  private def buildBmp(w: Int, h: Int, rgb: (Int, Int) => (Int, Int, Int),
                       topDown: Boolean = false): Array[Byte] = {
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val size = 54 + rowBytes * h
    val out = new Array[Byte](size)
    def put16(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o + 1) = (v >> 8).toByte }
    def put32(o: Int, v: Int): Unit = (0 to 3).foreach(i => out(o + i) = (v >> (8 * i)).toByte)
    out(0) = 'B'.toByte; out(1) = 'M'.toByte
    put32(2, size); put32(10, 54)       // file size, pixel-array offset
    put32(14, 40)                        // BITMAPINFOHEADER
    put32(18, w); put32(22, if (topDown) -h else h)
    put16(26, 1); put16(28, 24); put32(30, 0) // planes, bpp, BI_RGB
    for (y <- 0 until h; x <- 0 until w) {
      val srcRow = if (topDown) y else h - 1 - y // row y of the IMAGE
      val (r, g, b) = rgb(x, y)
      val o = 54 + srcRow * rowBytes + 3 * x
      out(o) = b.toByte; out(o + 1) = g.toByte; out(o + 2) = r.toByte
    }
    out
  }

  test("parseBmp decodes a hand-built BMP: dims, luma, row order, padding") {
    // 3×2 (row stride 12 with 3 padding bytes — exercises the 4-byte
    // row alignment): pixel (x,y) has r=10x, g=100y, b=5
    val bmp = buildBmp(3, 2, (x, y) => (10 * x, 100 * y, 5))
    val got = DctCodec.parseBmp(bmp).get
    assert((got.width, got.height) == (3, 2))
    assert(DctCodec.decodedDims(bmp).contains((3, 2)))
    // gray is TOP-DOWN row-major BT.601 luma — (x=2, y=1):
    // (299·20 + 587·100 + 114·5)/1000
    def luma(r: Int, g: Int, b: Int) = (299 * r + 587 * g + 114 * b) / 1000.0
    assert(got.gray(1 * 3 + 2) == luma(20, 100, 5))
    assert(got.gray(0) == luma(0, 0, 5))
    // a top-down container (negative height) decodes to the SAME image
    val td = DctCodec.parseBmp(buildBmp(3, 2, (x, y) => (10 * x, 100 * y, 5),
      topDown = true)).get
    assert(td.gray.toSeq == got.gray.toSeq)
    // non-BMP payloads refuse (tiled fallback path), as does a lying
    // header whose declared pixel array overruns the payload
    assert(DctCodec.parseBmp("plain text".getBytes("UTF-8")).isEmpty)
    assert(DctCodec.parseBmp(bmp.take(bmp.length - 1)).isEmpty)
    val lying = bmp.clone(); lying(18) = 100.toByte // width 100, same bytes
    assert(DctCodec.parseBmp(lying).isEmpty)
  }

  test("pHash flows through the real decode for BMP payloads") {
    // two BMPs with identical bytes except pixel CONTENT, same size:
    // the tiled fallback would see near-identical byte streams, but
    // the real decode must separate a flat image from a gradient
    val flat = buildBmp(16, 16, (_, _) => (128, 128, 128))
    val grad = buildBmp(16, 16, (x, y) => (16 * x, 16 * y, 0))
    assert(DctCodec.hash64(flat, 0) != DctCodec.hash64(grad, 0))
    // decode is deterministic and header-driven: re-assembled
    // identical image → identical hash
    assert(DctCodec.hash64(grad, 0) ==
      DctCodec.hash64(buildBmp(16, 16, (x, y) => (16 * x, 16 * y, 0)), 0))
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
