package graft.sources.fits.core

/** The FITS Tiled Image Compression convention's subtractive-dither
  * random sequence (SUBTRACTIVE_DITHER_1/2).
  *
  * The convention pins the generator exactly: a Park–Miller minimal-
  * standard LCG (a = 16807, m = 2^31 − 1, seed 1) run in double
  * arithmetic, 10000 values stored as FLOATS, with a published
  * self-check — after 10000 iterations the seed must equal
  * 1043618065. That golden constant is asserted at class load, so a
  * deviation from the published generator cannot decode silently-wrong
  * pixels: it refuses to initialize at all. (Verified independently
  * this build: m = 2^31 rather than 2^31 − 1 yields 686390145 — the
  * assert catches exactly this class of mistake.)
  *
  * Per-tile indexing (convention §"Preserving unbiased noise", the
  * fpack/funpack scheme): for 1-based tile number N and dither seed
  * ZDITHER0 ∈ [1, 10000], the starting index into the sequence is
  * `i0 = (N − 1 + ZDITHER0 − 1) mod 10000`, the running pixel index
  * starts at `(int)(rand[i0] · 500)`, and on reaching the end of the
  * sequence it restarts at `(int)(rand[++i0] · 500)`. Every pixel
  * position consumes exactly one value — including BLANK/zero pixels —
  * so reader and writer stay aligned without communicating.
  */
object FitsDither {
  val NRandom = 10000

  /** DITHER_2's exact-zero sentinel code: a pixel that was exactly 0.0
    * is stored as this int32 and restored to 0.0, bypassing the dither
    * arithmetic (the convention's lossless-zero guarantee). The value
    * is the convention's ZERO_VALUE — one above its reserved NULL code
    * −2147483647, so a dithered file's ZBLANK nulls can never collide
    * with its zeros. */
  val ZeroVal: Int = -2147483646

  val randValue: Array[Float] = {
    val a = 16807.0
    val m = 2147483647.0
    var seed = 1.0
    val out = new Array[Float](NRandom)
    var i = 0
    while (i < NRandom) {
      val temp = a * seed
      seed = temp - m * (temp / m).toLong
      out(i) = (seed / m).toFloat
      i += 1
    }
    require(seed == 1043618065.0,
      s"dither RNG self-check failed: final seed $seed != 1043618065")
    out
  }

  /** The offset stream for one tile. Not thread-safe; one per tile. */
  final class Stream(tileNum: Long, seed0: Int) {
    private var iseed: Int =
      (((tileNum - 1 + seed0 - 1) % NRandom + NRandom) % NRandom).toInt
    private var next: Int = (randValue(iseed) * 500f).toInt

    def nextOffset(): Float = {
      val v = randValue(next)
      next += 1
      if (next == NRandom) {
        iseed = (iseed + 1) % NRandom
        next = (randValue(iseed) * 500f).toInt
      }
      v
    }

    /** The offsets for a whole tile of `n` pixels, materialized (the
      * vectorized reader fills lines out of band order, so it indexes
      * by in-tile pixel position instead of streaming). */
    def take(n: Int): Array[Float] = {
      val out = new Array[Float](n)
      var i = 0
      while (i < n) { out(i) = nextOffset(); i += 1 }
      out
    }
  }
}
