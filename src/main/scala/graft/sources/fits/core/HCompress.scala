package graft.sources.fits.core

/** HCOMPRESS_1 tile codec — the H-transform image compression scheme
  * registered in the FITS Tiled Image Compression convention (Pence,
  * Seaman & White 2013 §5; algorithm published in White 1992, "High
  * Performance Compression of Astronomical Images").
  *
  * Pipeline: a reversible integer 2-D H-transform (Haar-like; the
  * per-level rounding keeps low-order bits recoverable from the
  * diagonal coefficient's parity, so `scale ≤ 1` is bit-exact
  * lossless), optional linear digitization by `scale`, then bitplane
  * coding — each bitplane of the |coefficient| field becomes a quadtree
  * whose 4-bit nodes are entropy-coded with the convention's fixed
  * Huffman table, with a raw-bitmap escape when quadtree coding would
  * expand. Coefficient signs follow the bitstream, one bit per nonzero
  * coefficient.
  *
  * Stream layout (integers big-endian): magic `0xDD 0x99`; nx, ny,
  * scale as 4-byte ints; the DC coefficient as an 8-byte long; one byte
  * of bitplane count per quadrant class (low/mixed/high); the quadtree
  * bitstream for the four coefficient quadrants, a zero EOF nybble, a
  * byte-boundary pad; then the packed sign bits.
  *
  * The reference does not read tile-compressed HDUs at all (its reader
  * targets plain IMAGE/BINTABLE HDUs only —
  * reference/src/main/scala/com/astrolabsoftware/sparkfits/FitsLib.scala:1);
  * this codec is beyond-reference surface alongside RICE_1/GZIP_1/2.
  * Interop caveat, stated honestly: lossless round-trips, the lossy
  * error bound, and the escape paths are spec-gated in HCompressSpec,
  * but this container ships no cfitsio/fpack binary, so decoding of
  * FOREIGN streams rests on the published format description alone.
  * Smoothed reconstruction (`ZVALn SMOOTH != 0`) is implemented — see
  * [[hsmooth]] for the formulation and its interop caveat.
  */
object HCompress {

  final case class Decoded(pixels: Array[Int], nx: Int, ny: Int, scale: Int)

  /** The convention's fixed Huffman code for quadtree nybbles: single-
    * bit nybbles (1,2,4,8) get 3-bit codes, the all-ones and empty
    * nybbles the longest. `Code(v)` read MSB-first re-derives `v` via
    * [[inputHuffman]] — the two tables are mutually consistent by the
    * prefix-tree construction. */
  private val Code = Array(
    0x3e, 0x00, 0x01, 0x08, 0x02, 0x09, 0x1a, 0x1b,
    0x03, 0x1c, 0x0a, 0x1d, 0x0b, 0x1e, 0x3f, 0x0c)
  private val NCode = Array(6, 3, 3, 4, 3, 4, 5, 5, 3, 5, 4, 5, 4, 5, 6, 4)

  private def bitsOf(v: Int): Int = 32 - Integer.numberOfLeadingZeros(v)
  private def log2Ceil(n: Int): Int = if (n <= 1) 0 else bitsOf(n - 1)

  // ---------------------------------------------------------------- encode

  /** Compress an nx(rows) × ny(cols) row-major image. `scale ≤ 1` is
    * lossless; `scale > 1` divides transform coefficients by `scale`
    * (max reconstruction error ~ scale/2 per coefficient). */
  def encode(pix: Array[Int], nx: Int, ny: Int, scale: Int): Array[Byte] = {
    require(nx > 0 && ny > 0 && pix.length == nx * ny,
      s"HCOMPRESS encode: ${pix.length} pixels for $nx x $ny")
    // The transform runs in Long and narrows afterwards: coefficient
    // magnitudes grow with both pixel magnitude and tile size, and the
    // stream stores int32 coefficients — Int arithmetic would WRAP and
    // decode to silently-wrong pixels (cfitsio's int path shares this
    // overflow; here it refuses instead). The BLANK sentinel of a
    // nullable int32 image (Int.MinValue) always lands here.
    val wide = new Array[Long](pix.length)
    var k = 0
    while (k < pix.length) { wide(k) = pix(k).toLong; k += 1 }
    htrans(wide, nx, ny)
    val s = math.max(scale, 0)
    if (s > 1) digitize(wide, s)
    val a = new Array[Int](pix.length)
    k = 0
    while (k < pix.length) {
      val v = wide(k)
      // The boundary is rejected too: the sign pass stores |coefficient|
      // and -Int.MinValue wraps, so a magnitude must fit a POSITIVE Int.
      if (v <= Int.MinValue || v > Int.MaxValue) {
        val hint =
          if (pix.contains(Int.MinValue))
            "the image holds Int.MinValue pixels (the nullable-int32 " +
              "BLANK sentinel cannot survive the H-transform — use " +
              "RICE_1 or GZIP for nullable int32 images)"
          else
            "pixel magnitudes are too large for this tile size — use a " +
              "smaller compressTile, or RICE_1/GZIP"
        throw new IllegalArgumentException(
          s"HCOMPRESS coefficient overflow at $nx x $ny: $hint")
      }
      a(k) = v.toInt
      k += 1
    }
    val nel = nx * ny
    val out = new java.io.ByteArrayOutputStream(nel / 2 + 64)
    out.write(0xDD); out.write(0x99)
    writeInt(out, nx); writeInt(out, ny); writeInt(out, s)
    writeLong(out, a(0).toLong)
    a(0) = 0
    // sign bits (one per nonzero coefficient, MSB-first), |coefficients|
    val sign = new Array[Byte]((nel + 7) / 8)
    var nsBits = 0
    var i = 0
    while (i < nel) {
      val v = a(i)
      if (v != 0) {
        if (v < 0) {
          sign(nsBits >> 3) = (sign(nsBits >> 3) | (0x80 >>> (nsBits & 7))).toByte
          a(i) = -v
        }
        nsBits += 1
      }
      i += 1
    }
    // bitplane count per quadrant class: 0 = low-order (top-left),
    // 1 = the two mixed quadrants, 2 = diagonal
    val nx2 = (nx + 1) / 2
    val ny2 = (ny + 1) / 2
    val vmax = new Array[Int](3)
    i = 0
    var r = 0
    var c = 0
    while (i < nel) {
      val q = (if (c >= ny2) 1 else 0) + (if (r >= nx2) 1 else 0)
      if (a(i) > vmax(q)) vmax(q) = a(i)
      i += 1
      c += 1
      if (c >= ny) { c = 0; r += 1 }
    }
    out.write(bitsOf(vmax(0))); out.write(bitsOf(vmax(1)))
    out.write(bitsOf(vmax(2)))
    val w = new BitWriter(out)
    qtreeEncode(w, a, 0, ny, nx2, ny2, bitsOf(vmax(0)))
    qtreeEncode(w, a, ny2, ny, nx2, ny / 2, bitsOf(vmax(1)))
    qtreeEncode(w, a, ny * nx2, ny, nx / 2, ny2, bitsOf(vmax(1)))
    qtreeEncode(w, a, ny * nx2 + ny2, ny, nx / 2, ny / 2, bitsOf(vmax(2)))
    w.writeNybble(0) // EOF sentinel
    w.flush()
    out.write(sign, 0, (nsBits + 7) / 8)
    out.toByteArray
  }

  // ---------------------------------------------------------------- decode

  /** Decompress one stream. `expectPix >= 0` pins the pixel count the
    * caller expects from the enclosing ZTILEn geometry and is validated
    * against the stream header BEFORE any allocation — a corrupt
    * 25-byte header can otherwise demand a ~1 GB scratch array.
    * `smooth` enables the lossy-mode smoothed reconstruction (the
    * `ZVALn SMOOTH != 0` convention flag) — see [[hsmooth]]; it is a
    * no-op for lossless streams (scale ≤ 1). */
  def decode(comp: Array[Byte], expectPix: Int = -1,
      smooth: Boolean = false): Decoded = {
    require(comp.length >= 25, s"HCOMPRESS stream of ${comp.length} bytes")
    require((comp(0) & 0xFF) == 0xDD && (comp(1) & 0xFF) == 0x99,
      "not an HCOMPRESS_1 stream (bad magic)")
    val nx = readInt(comp, 2)
    val ny = readInt(comp, 6)
    val scale = readInt(comp, 10)
    val sum = readLong(comp, 14)
    require(nx > 0 && ny > 0 && nx.toLong * ny <= (Int.MaxValue >> 3),
      s"HCOMPRESS tile dims $nx x $ny out of range")
    require(expectPix < 0 || nx.toLong * ny == expectPix,
      s"HCOMPRESS tile is $nx x $ny, expected $expectPix pixels")
    require(sum >= Int.MinValue && sum <= Int.MaxValue,
      s"HCOMPRESS DC coefficient $sum overflows int")
    val nb0 = comp(22) & 0xFF
    val nb1 = comp(23) & 0xFF
    val nb2 = comp(24) & 0xFF
    require(nb0 <= 32 && nb1 <= 32 && nb2 <= 32,
      s"HCOMPRESS bitplane counts $nb0/$nb1/$nb2")
    val nel = nx * ny
    val a = new Array[Int](nel)
    val rd = new BitReader(comp, 25)
    val nx2 = (nx + 1) / 2
    val ny2 = (ny + 1) / 2
    qtreeDecode(rd, a, 0, ny, nx2, ny2, nb0)
    qtreeDecode(rd, a, ny2, ny, nx2, ny / 2, nb1)
    qtreeDecode(rd, a, ny * nx2, ny, nx / 2, ny2, nb1)
    qtreeDecode(rd, a, ny * nx2 + ny2, ny, nx / 2, ny / 2, nb2)
    require(rd.readNybble() == 0, "HCOMPRESS: missing EOF nybble")
    rd.alignByte()
    // The inverse transform runs in Long, mirroring the forward pass:
    // hinv's block sums reach 4x the reconstructed pixel, so int32
    // pixels with |v| >= ~2^29 would wrap in Int arithmetic and decode
    // to silently-wrong values. Magnitudes widen UNSIGNED (a corrupt
    // stream can set bit 31 of a bitplane field) and signs apply in
    // the Long domain.
    val wide = new Array[Long](nel)
    var i = 0
    while (i < nel) {
      val m = a(i).toLong & 0xFFFFFFFFL
      wide(i) = if (m != 0 && rd.readBit() == 1) -m else m
      i += 1
    }
    wide(0) = sum
    if (scale > 1) {
      var j = 0
      while (j < nel) { wide(j) *= scale; j += 1 }
    }
    hinv(wide, nx, ny, if (smooth) scale else 0)
    // Lossless values always fit int32 exactly; clamping only tames
    // lossy-scale overshoot and corrupt-stream garbage.
    var j = 0
    while (j < nel) {
      val v = wide(j)
      a(j) =
        if (v > Int.MaxValue) Int.MaxValue
        else if (v < Int.MinValue) Int.MinValue
        else v.toInt
      j += 1
    }
    Decoded(a, nx, ny, scale)
  }

  // ------------------------------------------------------------ H-transform

  /** Forward H-transform, in place. Per level: 2×2 blocks become the
    * (sum, row-diff, col-diff, diagonal) coefficients with low bits
    * rounded away (recoverable from the diagonal's parity — see
    * [[hinv]]), then a shuffle groups same-order coefficients so the
    * next level transforms the sums. Odd edges transform as pairs or
    * pass through, scaled to match. */
  private def htrans(a: Array[Long], nx: Int, ny: Int): Unit = {
    val log2n = log2Ceil(math.max(nx, ny))
    val tmp = new Array[Long]((math.max(nx, ny) + 1) / 2)
    var shift = 0
    var mask = -2L
    var mask2 = -4L
    var prnd = 1L
    var prnd2 = 2L
    var nrnd2 = 1L
    var nxtop = nx
    var nytop = ny
    var k = 0
    while (k < log2n) {
      val oddx = nxtop & 1
      val oddy = nytop & 1
      var i = 0
      while (i < nxtop - oddx) {
        var s00 = i * ny
        var s10 = s00 + ny
        var j = 0
        while (j < nytop - oddy) {
          val a00 = a(s00); val a01 = a(s00 + 1)
          val a10 = a(s10); val a11 = a(s10 + 1)
          val h0 = (a11 + a10 + a01 + a00) >> shift
          val hx = (a11 + a10 - a01 - a00) >> shift
          val hy = (a11 - a10 + a01 - a00) >> shift
          val hc = (a11 - a10 - a01 + a00) >> shift
          a(s10 + 1) = hc
          a(s10) = (if (hx >= 0) hx + prnd else hx) & mask
          a(s00 + 1) = (if (hy >= 0) hy + prnd else hy) & mask
          a(s00) = (if (h0 >= 0) h0 + prnd2 else h0 + nrnd2) & mask2
          s00 += 2; s10 += 2; j += 2
        }
        if (oddy == 1) {
          val h0 = (a(s10) + a(s00)) << (1 - shift)
          val hx = (a(s10) - a(s00)) << (1 - shift)
          a(s10) = (if (hx >= 0) hx + prnd else hx) & mask
          a(s00) = (if (h0 >= 0) h0 + prnd2 else h0 + nrnd2) & mask2
        }
        i += 2
      }
      if (oddx == 1) {
        var s00 = (nxtop - 1) * ny
        var j = 0
        while (j < nytop - oddy) {
          val h0 = (a(s00 + 1) + a(s00)) << (1 - shift)
          val hy = (a(s00 + 1) - a(s00)) << (1 - shift)
          a(s00 + 1) = (if (hy >= 0) hy + prnd else hy) & mask
          a(s00) = (if (h0 >= 0) h0 + prnd2 else h0 + nrnd2) & mask2
          s00 += 2; j += 2
        }
        if (oddy == 1) {
          val s00 = (nxtop - 1) * ny + (nytop - 1)
          val h0 = a(s00) << (2 - shift)
          a(s00) = (if (h0 >= 0) h0 + prnd2 else h0 + nrnd2) & mask2
        }
      }
      var rr = 0
      while (rr < nxtop) { shuffle(a, rr * ny, nytop, 1, tmp); rr += 1 }
      var cc = 0
      while (cc < nytop) { shuffle(a, cc, nxtop, ny, tmp); cc += 1 }
      nxtop = (nxtop + 1) >> 1
      nytop = (nytop + 1) >> 1
      shift = 1
      mask = mask2
      prnd = prnd2
      mask2 <<= 1
      prnd2 <<= 1
      nrnd2 = prnd2 - 1
      k += 1
    }
  }

  /** Inverse H-transform, in place. Coarsest level first: unshuffle to
    * re-interleave, recover the rounded-away low bits of h0/hx/hy from
    * the diagonal coefficient's parity (all four coefficients of a
    * block share parity, and their sum is ≡ 0 mod 4), then invert the
    * block sums. The final level divides by 4 (the forward's level 0
    * kept full sums). Runs in Long — see [[decode]]. `smoothScale > 1`
    * applies [[hsmooth]] at each level before the block inversion. */
  private def hinv(a: Array[Long], nx: Int, ny: Int,
      smoothScale: Int = 0): Unit = {
    val log2n = log2Ceil(math.max(nx, ny))
    if (log2n == 0) return
    val tmp = new Array[Long]((math.max(nx, ny) + 1) / 2)
    var shift = 1
    var bit0 = 1 << (log2n - 1)
    var bit1 = bit0 << 1
    var mask0 = -bit0
    var mask1 = mask0 << 1
    var prnd0 = bit0 >> 1
    var prnd1 = bit0 // = bit1 >> 1, which prnd0 << 1 gets wrong at bit0 = 1
    var nrnd0 = prnd0 - 1
    var nrnd1 = prnd1 - 1
    var nxtop = 1
    var nytop = 1
    var nxf = nx
    var nyf = ny
    var c = 1 << log2n
    var k = log2n - 1
    while (k >= 0) {
      c >>= 1
      nxtop <<= 1
      nytop <<= 1
      if (nxf <= c) nxtop -= 1 else nxf -= c
      if (nyf <= c) nytop -= 1 else nyf -= c
      if (k == 0) { nrnd0 = 0; shift = 2 }
      var rr = 0
      while (rr < nxtop) { unshuffle(a, rr * ny, nytop, 1, tmp); rr += 1 }
      var cc = 0
      while (cc < nytop) { unshuffle(a, cc, nxtop, ny, tmp); cc += 1 }
      if (smoothScale > 1) hsmooth(a, nxtop, nytop, ny, smoothScale)
      val oddx = nxtop & 1
      val oddy = nytop & 1
      var i = 0
      while (i < nxtop - oddx) {
        var s00 = ny * i
        var s10 = s00 + ny
        var j = 0
        while (j < nytop - oddy) {
          var h0 = a(s00)
          var hx = a(s10)
          var hy = a(s00 + 1)
          var hc = a(s10 + 1)
          hx = (if (hx >= 0) hx + prnd1 else hx + nrnd1) & mask1
          hy = (if (hy >= 0) hy + prnd1 else hy + nrnd1) & mask1
          hc = (if (hc >= 0) hc + prnd0 else hc + nrnd0) & mask0
          val lowbit0 = hc & bit0
          hx = if (hx >= 0) hx - lowbit0 else hx + lowbit0
          hy = if (hy >= 0) hy - lowbit0 else hy + lowbit0
          val lowbit1 = (hc ^ hx ^ hy) & bit1
          h0 =
            if (h0 >= 0) h0 + lowbit0 - lowbit1
            else h0 + (if (lowbit0 == 0) lowbit1 else lowbit0 - lowbit1)
          a(s10 + 1) = (h0 + hx + hy + hc) >> shift
          a(s10) = (h0 + hx - hy - hc) >> shift
          a(s00 + 1) = (h0 - hx + hy - hc) >> shift
          a(s00) = (h0 - hx - hy + hc) >> shift
          s00 += 2; s10 += 2; j += 2
        }
        if (oddy == 1) {
          var h0 = a(s00)
          var hx = a(s10)
          hx = (if (hx >= 0) hx + prnd1 else hx + nrnd1) & mask1
          val lowbit1 = hx & bit1
          h0 = if (h0 >= 0) h0 - lowbit1 else h0 + lowbit1
          a(s10) = (h0 + hx) >> shift
          a(s00) = (h0 - hx) >> shift
        }
        i += 2
      }
      if (oddx == 1) {
        var s00 = ny * (nxtop - 1)
        var j = 0
        while (j < nytop - oddy) {
          var h0 = a(s00)
          var hy = a(s00 + 1)
          hy = (if (hy >= 0) hy + prnd1 else hy + nrnd1) & mask1
          val lowbit1 = hy & bit1
          h0 = if (h0 >= 0) h0 - lowbit1 else h0 + lowbit1
          a(s00 + 1) = (h0 + hy) >> shift
          a(s00) = (h0 - hy) >> shift
          s00 += 2; j += 2
        }
        if (oddy == 1) {
          val s00 = ny * (nxtop - 1) + (nytop - 1)
          a(s00) = a(s00) >> shift
        }
      }
      bit1 = bit0
      bit0 >>= 1
      mask1 = mask0
      mask0 >>= 1
      prnd1 = prnd0
      prnd0 >>= 1
      nrnd1 = nrnd0
      nrnd0 = prnd0 - 1
      k -= 1
    }
  }

  /** Smoothed reconstruction for lossy streams (White 1992 §"getting
    * rid of the blocks"; the convention's `SMOOTH` parameter). After
    * digitization each coefficient is only known to within ±scale/2,
    * so the decoder is free to move it anywhere inside that interval.
    * This pass replaces each interior difference coefficient with the
    * value INTERPOLATED from the neighboring zones' sums — the
    * gradient a smooth image would have — but never moves it more than
    * scale/2 from its decoded value, which preserves the lossy error
    * bound exactly (a smoothed reconstruction is as consistent with
    * the true image as the unsmoothed one; it just isn't blocky).
    *
    * Targets, derived from the coefficient definitions on a locally
    * linear/bilinear surface (zone centers sit 2 units apart at every
    * level, so a unit-slope surface has h0 differences 8× its hx/hy
    * and diagonal-h0 curvature 64× its hc):
    *   hx ← (h0[x+1] − h0[x−1]) / 8, hy ← (h0[y+1] − h0[y−1]) / 8,
    *   hc ← (h0[++] + h0[−−] − h0[−+] − h0[+−]) / 64,
    * with the hx/hy targets additionally monotonicity-constrained (the
    * interpolated slope may not exceed 4× the smaller one-sided h0
    * slope, and is not applied at all across a local extremum) so
    * smoothing cannot manufacture overshoot at edges. Edge zones are
    * left untouched. Division rounds toward zero.
    *
    * Interop caveat, stated honestly: the ±scale/2 clamp and the
    * hx/hy formulation follow the published description, but the
    * container ships no cfitsio/fpack to cross-check, so a foreign
    * SMOOTH file may reconstruct to slightly different (equally
    * in-bound) pixels than its writer's own decoder would produce —
    * both lie inside the same quantization interval of the original. */
  private def hsmooth(a: Array[Long], nxtop: Int, nytop: Int, ny: Int,
      scale: Int): Unit = {
    val smax = scale >> 1
    if (smax <= 0) return
    val ny2 = ny << 1
    // hx: x-direction differences, interior block rows only
    var i = 2
    while (i < nxtop - 2) {
      var j = 0
      while (j < nytop) {
        val s00 = ny * i + j
        val s10 = s00 + ny
        val hm = a(s00 - ny2)
        val h0 = a(s00)
        val hp = a(s00 + ny2)
        val dmax = math.max(math.min(hp - h0, h0 - hm), 0L) << 2
        val dmin = math.min(math.max(hp - h0, h0 - hm), 0L) << 2
        if (dmin < dmax) {
          val diff = math.max(math.min(hp - hm, dmax), dmin)
          var s = diff - (a(s10) << 3)
          s = if (s >= 0) s >> 3 else -((-s) >> 3)
          s = math.max(math.min(s, smax.toLong), -smax.toLong)
          a(s10) += s
        }
        j += 2
      }
      i += 2
    }
    // hy: y-direction differences, interior block columns only
    i = 0
    while (i < nxtop) {
      var j = 2
      while (j < nytop - 2) {
        val s00 = ny * i + j
        val hm = a(s00 - 2)
        val h0 = a(s00)
        val hp = a(s00 + 2)
        val dmax = math.max(math.min(hp - h0, h0 - hm), 0L) << 2
        val dmin = math.min(math.max(hp - h0, h0 - hm), 0L) << 2
        if (dmin < dmax) {
          val diff = math.max(math.min(hp - hm, dmax), dmin)
          var s = diff - (a(s00 + 1) << 3)
          s = if (s >= 0) s >> 3 else -((-s) >> 3)
          s = math.max(math.min(s, smax.toLong), -smax.toLong)
          a(s00 + 1) += s
        }
        j += 2
      }
      i += 2
    }
    // hc: cross term from the four diagonal zones, interior both ways
    i = 2
    while (i < nxtop - 2) {
      var j = 2
      while (j < nytop - 2) {
        val s00 = ny * i + j
        val s10 = s00 + ny
        val diff = a(s00 + ny2 + 2) + a(s00 - ny2 - 2) -
          a(s00 - ny2 + 2) - a(s00 + ny2 - 2)
        var s = diff - (a(s10 + 1) << 6)
        s = if (s >= 0) s >> 6 else -((-s) >> 6)
        s = math.max(math.min(s, smax.toLong), -smax.toLong)
        a(s10 + 1) += s
        j += 2
      }
      i += 2
    }
  }

  /** Group even-index elements (next level's sums) into the first half,
    * odd-index (this level's differences) into the second. */
  private def shuffle(a: Array[Long], off: Int, n: Int, stride: Int,
      tmp: Array[Long]): Unit = {
    var nt = 0
    var i = 1
    while (i < n) { tmp(nt) = a(off + i * stride); nt += 1; i += 2 }
    i = 2
    var p = 1
    while (i < n) { a(off + p * stride) = a(off + i * stride); p += 1; i += 2 }
    var t = 0
    while (t < nt) { a(off + p * stride) = tmp(t); p += 1; t += 1 }
  }

  private def unshuffle(a: Array[Long], off: Int, n: Int, stride: Int,
      tmp: Array[Long]): Unit = {
    val nhalf = (n + 1) >> 1
    var nt = 0
    var i = nhalf
    while (i < n) { tmp(nt) = a(off + i * stride); nt += 1; i += 1 }
    i = nhalf - 1
    while (i >= 1) { a(off + 2 * i * stride) = a(off + i * stride); i -= 1 }
    var t = 0
    while (t < nt) { a(off + (2 * t + 1) * stride) = tmp(t); t += 1 }
  }

  private def digitize(a: Array[Long], scale: Int): Unit = {
    val d = (scale + 1) / 2 - 1
    var i = 0
    while (i < a.length) {
      val v = a(i)
      a(i) = (if (v > 0) v + d else v - d) / scale
      i += 1
    }
  }

  // -------------------------------------------------------- quadtree coding

  /** Encode the bitplanes of one coefficient quadrant, highest plane
    * first. Per plane: extract the bits into a compact nybble grid,
    * Huffman-code the nonzero nybbles finest-level-first into a
    * buffer while reducing (a reduction nybble marks which children
    * are nonzero), then emit the buffer REVERSED — so the decoder sees
    * coarsest-first, each code MSB-first. If the Huffman stream would
    * outgrow the raw bitmap, escape to a direct nybble dump. */
  private def qtreeEncode(w: BitWriter, a: Array[Int], off: Int, stride: Int,
      nqx: Int, nqy: Int, nbitplanes: Int): Unit = {
    if (nqx <= 0 || nqy <= 0) {
      // empty quadrant of a 1-wide/1-tall image: planes may still be
      // declared (the count is shared with a nonempty sibling) — emit
      // cfitsio's form (the direct-bitmap escape nybble with zero data
      // nybbles, since bmax computes to 0 for an empty grid) so foreign
      // decoders parse streams this encoder writes
      var bit = nbitplanes - 1
      while (bit >= 0) {
        w.writeNybble(0)
        bit -= 1
      }
      return
    }
    val log2n = log2Ceil(math.max(nqx, nqy))
    val nx0 = (nqx + 1) >> 1
    val ny0 = (nqy + 1) >> 1
    val bmax = (nx0 * ny0 + 1) / 2
    val scratch = new Array[Byte](nx0 * ny0)
    val buffer = new Array[Byte](bmax)
    var bit = nbitplanes - 1
    while (bit >= 0) {
      qtreeOnebit(a, off, stride, nqx, nqy, bit, scratch)
      var nx = nx0
      var ny = ny0
      var b = 0
      var acc = 0
      var bits = 0
      var expanded = false
      // bufcopy: append Huffman codes for nonzero nybbles, LSB-first
      def addLevel(n: Int): Unit = {
        var i = 0
        while (i < n && !expanded) {
          val v = scratch(i) & 0xFF
          if (v != 0) {
            acc |= Code(v) << bits
            bits += NCode(v)
            if (bits >= 8) {
              buffer(b) = (acc & 0xFF).toByte
              b += 1
              if (b >= bmax) expanded = true
              acc >>>= 8
              bits -= 8
            }
          }
          i += 1
        }
      }
      addLevel(nx * ny)
      var k = 1
      while (!expanded && k < log2n) {
        qtreeReduce(scratch, nx, ny)
        nx = (nx + 1) >> 1
        ny = (ny + 1) >> 1
        addLevel(nx * ny)
        k += 1
      }
      if (expanded) {
        // escape: direct bitmap (warning nybble 0, then the raw grid)
        w.writeNybble(0)
        qtreeOnebit(a, off, stride, nqx, nqy, bit, scratch)
        var i = 0
        while (i < nx0 * ny0) { w.writeNybble(scratch(i) & 0xFF); i += 1 }
      } else {
        w.writeNybble(0xF)
        if (bits > 0) w.writeBits(acc & ((1 << bits) - 1), bits)
        else if (b == 0) w.writeBits(Code(0), NCode(0))
        var i = b - 1
        while (i >= 0) { w.writeBits(buffer(i) & 0xFF, 8); i -= 1 }
      }
      bit -= 1
    }
  }

  private def qtreeDecode(r: BitReader, a: Array[Int], off: Int, stride: Int,
      nqx: Int, nqy: Int, nbitplanes: Int): Unit = {
    if (nqx <= 0 || nqy <= 0) {
      var bit = nbitplanes - 1
      while (bit >= 0) {
        // Two valid encodings of an all-zero empty plane: this encoder
        // writes 0xF + the zero Huffman code; cfitsio's encoder takes
        // the direct-bitmap branch (bmax computes to 0) and emits
        // nybble 0 followed by zero data nybbles. Accept both so
        // foreign fpack streams with 1-row/1-column tiles decode.
        val fmt = r.readNybble()
        if (fmt == 0xF) inputHuffman(r)
        else if (fmt != 0) throw new IllegalArgumentException(
          s"HCOMPRESS: bad format code $fmt in empty quadrant")
        bit -= 1
      }
      return
    }
    val log2n = log2Ceil(math.max(nqx, nqy))
    val nx0 = (nqx + 1) >> 1
    val ny0 = (nqy + 1) >> 1
    val scratch = new Array[Byte](nx0 * ny0)
    var bit = nbitplanes - 1
    while (bit >= 0) {
      val fmt = r.readNybble()
      if (fmt == 0) {
        var i = 0
        while (i < nx0 * ny0) { scratch(i) = r.readNybble().toByte; i += 1 }
      } else if (fmt != 0xF) {
        throw new IllegalArgumentException(
          s"HCOMPRESS: bad bitplane format code $fmt")
      } else {
        scratch(0) = inputHuffman(r).toByte
        // replay the encoder's dimension chain n(k-1) = (n(k)+1)/2
        var nx = 1
        var ny = 1
        var nfx = nqx
        var nfy = nqy
        var cc = 1 << log2n
        var k = 1
        while (k < log2n) {
          cc >>= 1
          nx <<= 1
          ny <<= 1
          if (nfx <= cc) nx -= 1 else nfx -= cc
          if (nfy <= cc) ny -= 1 else nfy -= cc
          qtreeExpand(r, scratch, nx, ny)
          k += 1
        }
      }
      qtreeBitins(scratch, nqx, nqy, a, off, stride, bit)
      bit -= 1
    }
  }

  /** Extract bit `bit` of each coefficient into a compact nybble grid:
    * one nybble per 2×2 block, bit 3 = top-left … bit 0 = bottom-right
    * (missing edge children stay 0). */
  private def qtreeOnebit(a: Array[Int], off: Int, stride: Int, nqx: Int,
      nqy: Int, bit: Int, out: Array[Byte]): Unit = {
    val ny2 = (nqy + 1) >> 1
    var i = 0
    while (i < nqx) {
      val s0 = off + i * stride
      val s1 = if (i + 1 < nqx) s0 + stride else -1
      var j = 0
      while (j < nqy) {
        var v = ((a(s0 + j) >>> bit) & 1) << 3
        if (j + 1 < nqy) v |= ((a(s0 + j + 1) >>> bit) & 1) << 2
        if (s1 >= 0) {
          v |= ((a(s1 + j) >>> bit) & 1) << 1
          if (j + 1 < nqy) v |= (a(s1 + j + 1) >>> bit) & 1
        }
        out((i >> 1) * ny2 + (j >> 1)) = v.toByte
        j += 2
      }
      i += 2
    }
  }

  /** One quadtree reduction, in place: parent nybble = which of its
    * four children are nonzero. */
  private def qtreeReduce(b: Array[Byte], nx: Int, ny: Int): Unit = {
    val ny2 = (ny + 1) >> 1
    var i = 0
    while (i < nx) {
      val s0 = i * ny
      val s1 = if (i + 1 < nx) s0 + ny else -1
      var j = 0
      while (j < ny) {
        var v = if (b(s0 + j) != 0) 8 else 0
        if (j + 1 < ny && b(s0 + j + 1) != 0) v |= 4
        if (s1 >= 0) {
          if (b(s1 + j) != 0) v |= 2
          if (j + 1 < ny && b(s1 + j + 1) != 0) v |= 1
        }
        b((i >> 1) * ny2 + (j >> 1)) = v.toByte
        j += 2
      }
      i += 2
    }
  }

  /** One quadtree expansion, in place: spread each parent nybble to its
    * children as 0/1 marks, then replace every mark with its own nybble
    * read from the stream — in REVERSE scan order, mirroring the
    * encoder's byte reversal. */
  private def qtreeExpand(r: BitReader, b: Array[Byte], nx: Int,
      ny: Int): Unit = {
    qtreeCopy(b, nx, ny)
    var i = nx * ny - 1
    while (i >= 0) {
      if (b(i) != 0) b(i) = inputHuffman(r).toByte
      i -= 1
    }
  }

  /** Expand the compact (nx+1)/2 × (ny+1)/2 parent grid to nx × ny
    * child marks, in place (backwards, children of a parent written
    * before any earlier parent is read). */
  private def qtreeCopy(b: Array[Byte], nx: Int, ny: Int): Unit = {
    val nx2 = (nx + 1) >> 1
    val ny2 = (ny + 1) >> 1
    var i = nx2 - 1
    while (i >= 0) {
      var j = ny2 - 1
      while (j >= 0) {
        val v = b(i * ny2 + j) & 0xFF
        val s00 = 2 * i * ny + 2 * j
        if (2 * i + 1 < nx) {
          if (2 * j + 1 < ny) b(s00 + ny + 1) = (v & 1).toByte
          b(s00 + ny) = ((v >> 1) & 1).toByte
        }
        if (2 * j + 1 < ny) b(s00 + 1) = ((v >> 2) & 1).toByte
        b(s00) = ((v >> 3) & 1).toByte
        j -= 1
      }
      i -= 1
    }
  }

  /** OR bit `bit` back into the coefficient quadrant from the compact
    * nybble grid (inverse of [[qtreeOnebit]]). */
  private def qtreeBitins(s: Array[Byte], nqx: Int, nqy: Int, a: Array[Int],
      off: Int, stride: Int, bit: Int): Unit = {
    val ny2 = (nqy + 1) >> 1
    var i = 0
    while (i < nqx) {
      val s0 = off + i * stride
      val s1 = if (i + 1 < nqx) s0 + stride else -1
      var j = 0
      while (j < nqy) {
        val v = s((i >> 1) * ny2 + (j >> 1)) & 0xFF
        a(s0 + j) |= ((v >> 3) & 1) << bit
        if (j + 1 < nqy) a(s0 + j + 1) |= ((v >> 2) & 1) << bit
        if (s1 >= 0) {
          a(s1 + j) |= ((v >> 1) & 1) << bit
          if (j + 1 < nqy) a(s1 + j + 1) |= (v & 1) << bit
        }
        j += 2
      }
      i += 2
    }
  }

  /** Table-driven decode of the fixed prefix code: peek the longest
    * code width (6 bits), one lookup gives (value, length), consume
    * length. The table is built from [[Code]]/[[NCode]] directly, so
    * it IS the prefix tree — every 6-bit word maps to exactly one
    * code because the code is complete. */
  private val HuffValue = new Array[Byte](64)
  private val HuffLen = new Array[Byte](64)
  locally {
    var v = 0
    while (v < 16) {
      val len = NCode(v)
      val base = Code(v) << (6 - len)
      var fill = 0
      while (fill < (1 << (6 - len))) {
        HuffValue(base | fill) = v.toByte
        HuffLen(base | fill) = len.toByte
        fill += 1
      }
      v += 1
    }
  }

  private def inputHuffman(r: BitReader): Int = {
    val w = r.peekBits(6)
    r.consume(HuffLen(w))
    HuffValue(w)
  }

  // --------------------------------------------------------------- bit I/O

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var free = 8
    def writeBits(v: Int, n: Int): Unit = {
      acc = (acc << n) | (v & ((1 << n) - 1))
      free -= n
      while (free <= 0) {
        out.write((acc >>> -free) & 0xFF)
        free += 8
      }
    }
    def writeNybble(v: Int): Unit = writeBits(v, 4)
    def flush(): Unit = {
      if (free < 8) out.write((acc << free) & 0xFF)
      acc = 0
      free = 8
    }
  }

  /** MSB-first bit reader over a 64-bit accumulator. Peeks may look up
    * to 6 bits past the last real byte (virtually zero-padded — a valid
    * stream never CONSUMES padding, because the encoder byte-aligns
    * before the sign bits and writes whole sign bytes); consuming past
    * the real data throws, so truncated streams still fail loudly. */
  private final class BitReader(data: Array[Byte], start: Int) {
    private val realBits = (data.length - start).toLong * 8
    private var pos = start
    private var acc = 0L
    private var n = 0
    private var consumed = 0L
    private def fill(need: Int): Unit =
      while (n < need) {
        acc = (acc << 8) | (if (pos < data.length) data(pos) & 0xFF else 0)
        pos += 1
        n += 8
      }
    def peekBits(k: Int): Int = {
      fill(k)
      ((acc >>> (n - k)) & ((1L << k) - 1)).toInt
    }
    def consume(k: Int): Unit = {
      n -= k
      consumed += k
      if (consumed > realBits)
        throw new IllegalArgumentException("HCOMPRESS: truncated stream")
    }
    def readBits(k: Int): Int = {
      val v = peekBits(k)
      consume(k)
      v
    }
    def readBit(): Int = readBits(1)
    def readNybble(): Int = readBits(4)
    /** Discard the rest of the current byte (sign bits restart aligned). */
    def alignByte(): Unit = {
      val slack = (consumed % 8).toInt
      if (slack != 0) { fill(8 - slack); consume(8 - slack) }
    }
  }

  private def writeInt(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 24) & 0xFF); out.write((v >>> 16) & 0xFF)
    out.write((v >>> 8) & 0xFF); out.write(v & 0xFF)
  }

  private def writeLong(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    writeInt(out, (v >>> 32).toInt); writeInt(out, v.toInt)
  }

  private def readInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
      ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)

  private def readLong(b: Array[Byte], off: Int): Long =
    (readInt(b, off).toLong << 32) | (readInt(b, off + 4).toLong & 0xFFFFFFFFL)
}
