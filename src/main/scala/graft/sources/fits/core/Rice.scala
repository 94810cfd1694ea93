package graft.sources.fits.core

/** RICE_1 tile codec (FITS Tiled Image Compression registered
  * convention §5.1 / Pence, White & Seaman 2009, PASP 121:414 — the
  * `fpack` default). Implemented from the published algorithm
  * description, not ported from any implementation.
  *
  * Stream layout (MSB-first bits): the first pixel is stored raw in
  * `bytepix` big-endian bytes, then every pixel (including the first,
  * whose difference is 0) is coded per block of `blocksize` pixels as a
  * zig-zag-mapped difference from the previous pixel:
  *
  *  - a block starts with an `fsbits`-wide code F; fs = F − 1
  *  - fs = −1: low-entropy escape, every difference in the block is 0
  *  - fs = fsmax: high-entropy escape, differences stored raw in
  *    8·bytepix bits
  *  - else: Golomb-Rice — unary top part (count of 0-bits before a 1)
  *    then fs literal low bits; diff = (top << fs) | low
  *
  * zig-zag map: d ≥ 0 → 2d, d < 0 → −2d−1; inverse
  * diff even → diff>>>1, odd → ~(diff>>>1). All arithmetic is mod
  * 2^(8·bytepix), so signed/unsigned conventions round-trip exactly.
  *
  * (fsbits, fsmax) per bytepix: 1→(3,6), 2→(4,14), 4→(5,25).
  */
object Rice {

  private def params(bytepix: Int): (Int, Int) = bytepix match {
    case 1 => (3, 6)
    case 2 => (4, 14)
    case 4 => (5, 25)
    case other => throw new IllegalArgumentException(
      s"RICE_1 BYTEPIX must be 1, 2 or 4 (got $other)")
  }

  /** MSB-first bit reader. A class with plain Int fields, NOT nested
    * defs over captured vars: scalac compiles captured vars to heap
    * IntRef cells, and the per-bit indirection made decode the hot-path
    * cost of compressed scans (measured ~5× slower than this form).
    * `unary` scans runs of 0-bits a buffered word at a time via
    * numberOfLeadingZeros instead of one call per bit. */
  private final class BitReader(comp: Array[Byte], start: Int) {
    private var pos = start
    private var buf = 0L // valid bits are the low `cnt` bits
    private var cnt = 0

    private def refill(need: Int): Unit = {
      while (cnt < need) {
        if (pos >= comp.length) throw new IllegalArgumentException(
          "RICE_1 stream truncated")
        buf = (buf << 8) | (comp(pos) & 0xffL); pos += 1; cnt += 8
      }
    }

    def bits(n: Int): Int = {
      refill(n)
      cnt -= n
      ((buf >>> cnt) & ((1L << n) - 1)).toInt
    }

    /** Count of 0-bits before the next 1-bit (the 1 is consumed). */
    def unary(maxTop: Long): Int = {
      var top = 0L
      while (true) {
        if (cnt == 0) refill(1)
        val window = buf & ((1L << cnt) - 1)
        if (window == 0) { top += cnt; cnt = 0 }
        else {
          val z = cnt - (64 - java.lang.Long.numberOfLeadingZeros(window))
          cnt -= z + 1
          return (top + z).toInt
        }
        if (top > maxTop) throw new IllegalArgumentException(
          "RICE_1 stream corrupt: runaway unary code")
      }
      0 // unreachable
    }
  }

  /** Decompress `nPix` pixels into big-endian pixel bytes
    * (nPix × bytepix), i.e. exactly the uncompressed tile payload. */
  def decode(comp: Array[Byte], nPix: Int, bytepix: Int,
      blocksize: Int = 32): Array[Byte] = {
    val (fsbits, fsmax) = params(bytepix)
    val bbits = 8 * bytepix
    val out = new Array[Byte](nPix * bytepix)
    if (nPix == 0) return out
    if (comp.length < bytepix) throw new IllegalArgumentException(
      s"RICE_1 stream too short: ${comp.length} bytes")
    var lastpix = 0
    var k = 0
    while (k < bytepix) { lastpix = (lastpix << 8) | (comp(k) & 0xff); k += 1 }

    val r = new BitReader(comp, bytepix)
    // Long: 8 * length overflows Int for payloads >= 256 MiB (the
    // MaxVarElement cap admits exactly 2^28 bytes), which would make a
    // maximal legal tile spuriously fail as "runaway unary code".
    val maxTop = 8L * comp.length

    def put(i: Int, v: Int): Unit = {
      var b = bytepix
      var x = v
      while (b > 0) {
        out(i * bytepix + b - 1) = x.toByte
        x >>>= 8
        b -= 1
      }
    }

    var i = 0
    while (i < nPix) {
      val fs = r.bits(fsbits) - 1
      val imax = math.min(i + blocksize, nPix)
      if (fs < 0) {
        while (i < imax) { put(i, lastpix); i += 1 }
      } else if (fs == fsmax) {
        while (i < imax) {
          val diff = r.bits(bbits)
          val d = if ((diff & 1) == 0) diff >>> 1 else ~(diff >>> 1)
          lastpix += d
          put(i, lastpix)
          i += 1
        }
      } else {
        while (i < imax) {
          val top = r.unary(maxTop)
          val diff = (top << fs) | (if (fs > 0) r.bits(fs) else 0)
          val d = if ((diff & 1) == 0) diff >>> 1 else ~(diff >>> 1)
          lastpix += d
          put(i, lastpix)
          i += 1
        }
      }
    }
    out
  }

  /** MSB-first bit writer — class fields for the same captured-var
    * reason as [[BitReader]]. */
  private final class BitWriter(expectedBytes: Int) {
    private val bos = new java.io.ByteArrayOutputStream(expectedBytes)
    private var bitBuf = 0
    private var bitCnt = 0
    def putBits(v: Int, n: Int): Unit = {
      var left = n
      while (left > 0) {
        val take = math.min(left, 8 - bitCnt)
        bitBuf = (bitBuf << take) |
          ((v >>> (left - take)) & ((1 << take) - 1))
        bitCnt += take
        left -= take
        if (bitCnt == 8) { bos.write(bitBuf); bitBuf = 0; bitCnt = 0 }
      }
    }
    def writeByte(b: Int): Unit = bos.write(b)
    def result(): Array[Byte] = {
      if (bitCnt > 0) putBits(0, 8 - bitCnt) // flush
      bos.toByteArray
    }
  }

  /** Compress big-endian pixel bytes (nPix × bytepix). Any legal fs
    * choice decodes identically; per block this picks fs from the max
    * zig-zag difference so the unary part stays ≤ 16 bits, falling back
    * to the raw escape when fs would reach fsmax. */
  def encode(tile: Array[Byte], bytepix: Int,
      blocksize: Int = 32): Array[Byte] = {
    val (fsbits, fsmax) = params(bytepix)
    val bbits = 8 * bytepix
    val nPix = tile.length / bytepix
    val w = new BitWriter(tile.length / 2 + 16)
    def putBits(v: Int, n: Int): Unit = w.putBits(v, n)
    def pix(i: Int): Int = {
      var v = 0
      var b = 0
      while (b < bytepix) { v = (v << 8) | (tile(i * bytepix + b) & 0xff); b += 1 }
      v
    }
    if (nPix == 0) return Array.emptyByteArray
    // raw first pixel
    var b = bytepix
    val first = pix(0)
    while (b > 0) { w.writeByte((first >>> ((b - 1) * 8)) & 0xff); b -= 1 }

    // mask values to bytepix range so diffs are mod 2^bbits
    val mask = if (bytepix == 4) -1 else (1 << bbits) - 1
    var lastpix = first
    var i = 0
    while (i < nPix) {
      val imax = math.min(i + blocksize, nPix)
      // zig-zag diffs for the block
      val diffs = new Array[Int](imax - i)
      var dmax = 0
      var j = i
      var lp = lastpix
      while (j < imax) {
        val p = pix(j)
        // difference mod 2^bbits, sign-extended to Int
        var d = (p - lp) & mask
        if (bytepix < 4 && d > (mask >>> 1)) d -= (mask + 1)
        val zz = if (d >= 0) d << 1 else ~(d << 1)
        diffs(j - i) = zz
        // compare as unsigned (bytepix=4 diffs can wrap negative)
        if ((zz ^ Int.MinValue) > (dmax ^ Int.MinValue)) dmax = zz
        lp = p
        j += 1
      }
      lastpix = lp
      if (dmax == 0) putBits(0, fsbits) // low-entropy: all-zero block
      else {
        // smallest fs with unary part (dmax >>> fs) < 16 — compared as
        // UNSIGNED via Long: zig-zag diffs over 2^31 are negative Ints,
        // and `x >>> 0` keeps the sign bit
        val dmaxU = dmax & 0xFFFFFFFFL
        var fs = 0
        while (fs < fsmax && (dmaxU >>> fs) >= 16) fs += 1
        if (fs >= fsmax || (dmaxU >>> fs) >= 16) {
          putBits(fsmax + 1, fsbits) // raw escape
          diffs.foreach(zz => putBits(zz, bbits))
        } else {
          putBits(fs + 1, fsbits)
          diffs.foreach { zz =>
            var t = ((zz & 0xFFFFFFFFL) >>> fs).toInt // unary top, < 16
            while (t > 0) { putBits(0, 1); t -= 1 }
            putBits(1, 1)
            if (fs > 0) putBits(zz & ((1 << fs) - 1), fs)
          }
        }
      }
      i = imax
    }
    w.result()
  }
}
