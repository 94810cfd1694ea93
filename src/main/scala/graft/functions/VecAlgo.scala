package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Vector kernels for the similarity surface. Companion-of-class so the
  * generated whole-stage code can call them as statics. Inputs are
  * Catalyst ArrayData over FloatType (the embeddings' physical type);
  * accumulation is double, left-to-right.
  */
class VecAlgo private ()

object VecAlgo {

  /** Cosine similarity of two float vectors. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Dot product of two float vectors. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  /** Rademacher sign tables, memoized per (nBits, dim): the hyperplane
    * signs are ROW-INDEPENDENT, yet the original loop re-derived
    * fmix64(k, j) for every row — at 13-bit × 8-band geometry over
    * 64-dim vectors that is ~6 600 hash computations per row, the
    * dominant cost of signing a large corpus. The table is nBits × dim
    * bytes (a few KB) computed once per JVM; entries are the SAME
    * fmix64-derived signs, so signatures are bit-identical to the
    * original derivation (pinned by SimSignatureSpec). */
  private val signTables =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Byte]]()

  private def signTable(nBits: Int, d: Int): Array[Byte] =
    signTables.computeIfAbsent((nBits, d), { case (b, dim) =>
      val t = new Array[Byte](b * dim)
      var k = 0
      while (k < b) {
        var j = 0
        while (j < dim) {
          val r = TextAlgo.fmix64(k.toLong * 0x9e3779b97f4a7c15L + j)
          t(k * dim + j) = if ((r & 1L) == 1L) 1 else -1
          j += 1
        }
        k += 1
      }
      t
    })

  /** Random-hyperplane (sign) LSH signature: bit k of the result is the
    * sign of ⟨v, r_k⟩ where r_k is a deterministic Rademacher (±1)
    * vector derived from fmix64(k, j). Collision probability of a bit
    * is 1 − θ/π for angle θ — the standard SimHash-for-cosine scheme.
    */
  def signSignature(v: ArrayData, nBits: Int): Long = {
    val d = v.numElements()
    val signs = signTable(nBits, d)
    var sig = 0L
    var k = 0
    while (k < nBits) {
      var acc = 0.0
      val base = k * d
      var j = 0
      while (j < d) {
        val x = v.getFloat(j)
        if (signs(base + j) > 0) acc += x else acc -= x
        j += 1
      }
      if (acc >= 0) sig |= (1L << k)
      k += 1
    }
    sig
  }

  /** [[signSignature]] for arbitrary widths: bit k lands in word k/64.
    * Bits 0..63 match signSignature(v, 64) exactly (same hyperplanes),
    * so widening a signature only APPENDS bits — narrow- and wide-band
    * geometries agree on their shared prefix. */
  def signSignatureWords(v: ArrayData, nBits: Int): Array[Long] = {
    val d = v.numElements()
    val signs = signTable(nBits, d)
    val words = new Array[Long]((nBits + 63) >>> 6)
    var k = 0
    while (k < nBits) {
      var acc = 0.0
      val base = k * d
      var j = 0
      while (j < d) {
        val x = v.getFloat(j)
        if (signs(base + j) > 0) acc += x else acc -= x
        j += 1
      }
      if (acc >= 0) words(k >>> 6) |= (1L << (k & 63))
      k += 1
    }
    words
  }
}
