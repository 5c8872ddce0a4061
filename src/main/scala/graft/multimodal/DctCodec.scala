package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** A REAL perceptual codec on the [[MediaCodec]] seam: the textbook
  * DCT pHash pipeline — gray raster → 2-D DCT-II → low-frequency 8×8
  * block → median threshold → bit string — with only the byte→raster
  * decode step synthesized (payload bytes tiled as pixels), because
  * no image library ships in this build. It demonstrates the seam
  * carries a real algorithm end-to-end with the properties the banded
  * near-dup join in `mm_phash_neardup` relies on: byte-identical
  * payloads hash equal, small payload edits move few bits, unrelated
  * payloads land far apart.
  *
  * Plan note: these are Scala UDFs — the decode is opaque JVM work,
  * as any real codec's would be. A production impl would register a
  * native `Expression` with `doGenCode`; either way the surrounding
  * OPERATORS are unchanged: signatures are computed in a narrow
  * projection before any shuffle, payloads never move.
  */
object DctCodec extends MediaCodec {

  private val N = 32 // raster side
  private val K = 8  // low-frequency block side

  // DCT-II basis, C(u)(x) = cos((2x+1) u π / 2N), precomputed once
  // per JVM (object init — executors rebuild it on class load).
  private val cosT: Array[Array[Double]] =
    Array.tabulate(K, N)((u, x) => math.cos((2 * x + 1) * u * math.Pi / (2.0 * N)))

  /** Synthesized decode: tile payload bytes into an N×N gray raster,
    * reading from `offset` (frame index × raster size for videos —
    * the stand-in for seeking to a frame). */
  private def raster(payload: Array[Byte], offset: Long): Array[Double] = {
    val out = new Array[Double](N * N)
    if (payload.nonEmpty) {
      val len = payload.length
      var i = 0
      while (i < N * N) {
        out(i) = (payload(((offset + i) % len).toInt) & 0xff).toDouble
        i += 1
      }
    }
    out
  }

  /** Low-frequency K×K block of the 2-D DCT-II of the raster,
    * computed separably: rows first, then columns. */
  private def dctLowFreq(f: Array[Double]): Array[Double] = {
    val tmp = Array.ofDim[Double](K, N) // tmp(u)(y) = Σ_x f(x,y)·C(u)(x)
    var u = 0
    while (u < K) {
      var y = 0
      while (y < N) {
        var s = 0.0
        var x = 0
        while (x < N) { s += f(x * N + y) * cosT(u)(x); x += 1 }
        tmp(u)(y) = s
        y += 1
      }
      u += 1
    }
    val out = new Array[Double](K * K)
    u = 0
    while (u < K) {
      var v = 0
      while (v < K) {
        var s = 0.0
        var y = 0
        while (y < N) { s += tmp(u)(y) * cosT(v)(y); y += 1 }
        out(u * K + v) = s
        v += 1
      }
      u += 1
    }
    out
  }

  /** 64-bit pHash: bit k set iff coefficient k exceeds the median of
    * the K×K block. */
  def hash64(payload: Array[Byte], offset: Long): Long = {
    val c = dctLowFreq(raster(payload, offset))
    val sorted = c.clone(); java.util.Arrays.sort(sorted)
    val median = (sorted(K * K / 2 - 1) + sorted(K * K / 2)) / 2.0
    var h = 0L
    var k = 0
    while (k < K * K) {
      if (c(k) > median) h |= (1L << k)
      k += 1
    }
    h
  }

  private def md5hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"${b & 0xff}%02x").mkString

  // ---- column-level API ------------------------------------------

  /** 60-bit DCT pHash (masked to the 4×15-bit banding width). */
  private val phashUdf = udf((p: Array[Byte]) => hash64(p, 0L) & ((1L << 60) - 1))
  def phash(payload: Column, mediaId: Column): Column = phashUdf(payload)

  /** 32-bit frame signature: pHash of the frame's raster window. */
  private val frameSigUdf = udf((p: Array[Byte], idx: Long) =>
    hash64(p, idx * N * N) & 0xffffffffL)
  def frameSig(payload: Column, mediaId: Column, frameIdx: Column): Column =
    frameSigUdf(payload, frameIdx.cast("long"))

  /** Frame energy: mean byte value of the frame's 256-sample window,
    * mapped to the stub's 0..65535 range with full scale at mean 127
    * (mid-range "loud") so the VAD threshold calibrated on the stub
    * stays meaningful. */
  private val energyUdf = udf((p: Array[Byte], idx: Long) => {
    if (p.isEmpty) 0L
    else {
      var s = 0L
      var i = 0
      while (i < 256) { s += (p(((idx * 256 + i) % p.length).toInt) & 0xff); i += 1 }
      math.min(s * 65535 / (256 * 127), 65535L)
    }
  })
  def frameEnergy(payload: Column, mediaId: Column, frameIdx: Column): Column =
    energyUdf(payload, frameIdx.cast("long"))

  /** Digest of the decoded frame raster bytes. */
  private val frameDigestUdf = udf((p: Array[Byte], idx: Long) =>
    md5hex(raster(p, idx * N * N).map(_.toInt.toByte)))
  def frameDigest(payload: Column, mediaId: Column, frameIdx: Column): Column =
    frameDigestUdf(payload, frameIdx.cast("long"))

  /** Digest of a nearest-neighbor resample of the raster to the thumb
    * dimensions — a real (if tiny) resize over decoded pixels. */
  private val thumbUdf = udf((p: Array[Byte], w: Int, h: Int) => {
    val r = raster(p, 0L)
    val out = new Array[Byte](math.max(w, 1) * math.max(h, 1))
    var j = 0
    while (j < h) {
      var i = 0
      while (i < w) {
        out(j * w + i) = r((j * N / math.max(h, 1)) * N + (i * N / math.max(w, 1))).toInt.toByte
        i += 1
      }
      j += 1
    }
    md5hex(out)
  })
  def thumbDigest(payload: Column, thumbW: Column, thumbH: Column): Column =
    thumbUdf(payload, thumbW.cast("int"), thumbH.cast("int"))

  // ---- row-level decode ------------------------------------------

  def openBatch(): MediaCodec.BatchSession = Batch

  private object Batch extends MediaCodec.BatchSession {
    /** Real feature extraction: the first 8 non-DC low-frequency DCT
      * coefficients, squashed to (0,1) via a logistic on a fixed
      * scale — a deterministic, content-derived embedding. */
    def embed(payload: Array[Byte]): Array[Float] = {
      val c = dctLowFreq(raster(payload, 0L))
      (1 to 8).map(k => (1.0 / (1.0 + math.exp(-c(k) / 512.0))).toFloat).toArray
    }
  }
}
