package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** A REAL perceptual codec on the [[MediaCodec]] seam: the textbook
  * DCT pHash pipeline — gray raster → 2-D DCT-II → low-frequency 8×8
  * block → median threshold → bit string. The byte→raster decode is
  * real for uncompressed BMP containers (header parsed by pure byte
  * arithmetic — see parseBmp: dimensions and pixels flow from
  * actual payload structure) and synthesized for everything else
  * (payload bytes tiled as pixels), because no image library ships
  * in this build. It demonstrates the seam
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

  /** A decoded uncompressed BMP: dimensions from the real container
    * header, gray pixels row-major TOP-DOWN. */
  private[graft] final case class Bmp(
    width: Int, height: Int, gray: Array[Double])

  private def le16(p: Array[Byte], o: Int): Int =
    (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
  private def le32(p: Array[Byte], o: Int): Int =
    (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8) |
      ((p(o + 2) & 0xff) << 16) | ((p(o + 3) & 0xff) << 24)

  /** REAL container decode, pure byte arithmetic: Windows BMP with a
    * BITMAPINFOHEADER-or-larger DIB, 24-bpp, BI_RGB (uncompressed).
    * Layout per the public format: 'BM' magic, pixel-array offset at
    * byte 10, DIB size at 14, little-endian signed width/height at
    * 18/22 (negative height = top-down), planes at 26, bpp at 28,
    * compression at 30; each pixel row is BGR triples padded to a
    * 4-byte boundary, rows stored bottom-up unless top-down. Any
    * malformed/foreign payload → None (tiled-raster fallback), with
    * the declared pixel array bounds-checked against the actual
    * payload so a lying header can never read out of bounds. */
  private[graft] def parseBmp(p: Array[Byte]): Option[Bmp] = {
    if (p.length < 54 || p(0) != 'B'.toByte || p(1) != 'M'.toByte) return None
    val dataOff = le32(p, 10)
    if (le32(p, 14) < 40) return None
    val w = le32(p, 18)
    val hRaw = le32(p, 22)
    if (w <= 0 || hRaw == 0 || le16(p, 26) != 1 ||
      le16(p, 28) != 24 || le32(p, 30) != 0) return None
    val h = math.abs(hRaw)
    val topDown = hRaw < 0
    val rowBytes = ((w * 3 + 3) / 4) * 4
    // bound the decode (a header can declare anything) and verify the
    // declared pixel array actually fits inside the payload
    if (w.toLong * h > (1L << 24)) return None
    if (dataOff < 54 || dataOff.toLong + rowBytes.toLong * h > p.length)
      return None
    val gray = new Array[Double](w * h)
    var y = 0
    while (y < h) {
      val ro = dataOff + (if (topDown) y else h - 1 - y) * rowBytes
      var x = 0
      while (x < w) {
        val b = p(ro + 3 * x) & 0xff
        val g = p(ro + 3 * x + 1) & 0xff
        val r = p(ro + 3 * x + 2) & 0xff
        // ITU-R BT.601 integer luma, the same weighting every
        // real gray conversion uses
        gray(y * w + x) = (299 * r + 587 * g + 114 * b) / 1000.0
        x += 1
      }
      y += 1
    }
    Some(Bmp(w, h, gray))
  }

  /** Dimensions as decoded from a real container header, if the
    * payload is one (spec/diagnostic hook: proves width/height flow
    * from payload STRUCTURE, not metadata columns). */
  def decodedDims(payload: Array[Byte]): Option[(Int, Int)] =
    parseBmp(payload).map(b => (b.width, b.height))

  /** Decode to the N×N analysis raster. Payloads carrying a real BMP
    * container are decoded through their header — dimensions and
    * pixels from actual payload structure, nearest-neighbor resampled
    * to N×N, `offset` (the frame stand-in) shifting the source pixel
    * index modulo the image. Anything else falls back to tiling the
    * raw bytes as pixels from `offset` (no image libs ship in this
    * build, so arbitrary payloads still raster deterministically). */
  private def raster(payload: Array[Byte], offset: Long): Array[Double] = {
    parseBmp(payload) match {
      case Some(bmp) =>
        val out = new Array[Double](N * N)
        val np = bmp.width.toLong * bmp.height
        var j = 0
        while (j < N) {
          var i = 0
          while (i < N) {
            val sy = j * bmp.height / N
            val sx = i * bmp.width / N
            out(j * N + i) = bmp.gray(
              ((sy.toLong * bmp.width + sx + offset) % np).toInt)
            i += 1
          }
          j += 1
        }
        out
      case None =>
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
