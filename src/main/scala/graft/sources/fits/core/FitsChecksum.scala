package graft.sources.fits.core

/** FITS CHECKSUM/DATASUM convention (FITS 4.0 §4.4.2.7-8, Seaman,
  * Pence & Rots). The HDU is summed as big-endian unsigned 32-bit
  * words with ones'-complement (end-around-carry) addition; DATASUM
  * records the data blocks' sum as a decimal string, and CHECKSUM
  * holds 16 ASCII characters chosen so the sum of the ENTIRE HDU
  * (header blocks included) folds to 0xFFFFFFFF ("-0") — which is the
  * property every verifier, this one and cfitsio/astropy alike,
  * actually checks.
  *
  * All summed regions here are whole 2880-byte blocks, so 4-byte word
  * alignment is structural; partial sums over block-aligned ranges are
  * plain u64 additions folded at the end — which is what makes the
  * verification distributable (see FitsChecksumReport).
  */
object FitsChecksum {

  /** u32-word sum of a 4-byte-aligned range, accumulated in u64.
    * Callers may add partials from disjoint aligned ranges. */
  def wordSum(buf: Array[Byte], off: Int, len: Int): Long = {
    require(len % 4 == 0, s"checksum range must be 4-byte aligned: $len")
    var acc = 0L
    var i = off
    val end = off + len
    while (i < end) {
      acc += ((buf(i) & 0xffL) << 24) | ((buf(i + 1) & 0xffL) << 16) |
        ((buf(i + 2) & 0xffL) << 8) | (buf(i + 3) & 0xffL)
      i += 4
    }
    acc
  }

  /** End-around-carry fold to the 32-bit ones'-complement sum. */
  def fold(sum: Long): Long = {
    var s = sum
    while ((s >>> 32) != 0) s = (s & 0xFFFFFFFFL) + (s >>> 32)
    s
  }

  /** True iff a folded whole-HDU sum verifies (-0). */
  def verifies(foldedTotal: Long): Boolean = foldedTotal == 0xFFFFFFFFL

  private val Excluded: Set[Int] =
    ":;<=>?@[\\]^_`".map(_.toInt).toSet

  /** Encodes complement value `v` (u32) as the 16 CHECKSUM characters.
    * Each byte of `v` becomes 4 chars summing to byte + 4·'0' (so the
    * replacement of the '0'*16 placeholder adds exactly `v` to the HDU
    * sum), punctuation is traded between pair members (sum-preserving),
    * and the result is rotated right one place — which aligns byte k's
    * chars with the k-th byte lane of the 32-bit words, given the
    * value's quote position inside the card. */
  def encode(v: Long): String = {
    val ascii = new Array[Int](16)
    var k = 0
    while (k < 4) {
      val b = ((v >>> (8 * (3 - k))) & 0xff).toInt
      val q = b / 4 + '0'
      val r = b % 4
      val ch = Array(q, q, q, q)
      var j = 0
      while (j < r) { ch(j) += 1; j += 1 }
      // sum-preserving repair of excluded punctuation, pairwise
      var changed = true
      while (changed) {
        changed = false
        for (p <- Seq(0, 2)) {
          if (Excluded(ch(p)) || Excluded(ch(p + 1))) {
            ch(p) += 1; ch(p + 1) -= 1; changed = true
          }
        }
      }
      var i = 0
      while (i < 4) { ascii(k + 4 * i) = ch(i); i += 1 }
      k += 1
    }
    // rotate right by one
    val out = new Array[Char](16)
    var i = 0
    while (i < 16) { out((i + 1) % 16) = ascii(i).toChar; i += 1 }
    new String(out)
  }

  /** The complement to encode so a sum currently folding to `folded`
    * verifies once the placeholder is replaced. */
  def complement(folded: Long): Long = 0xFFFFFFFFL - folded
}
