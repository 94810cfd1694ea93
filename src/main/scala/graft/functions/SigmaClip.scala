package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Sigma-clipped statistics as a typed `Aggregator` (SURVEY B21 — the
  * reference's im2cat.py:101-117 computes per-image sigma-clipped stats
  * driver-side in Python; here it is a first-class distributed
  * aggregate).
  *
  * Semantics (fixed-point, `iters` rounds): compute mean/stddev_samp,
  * keep values with |v − mean| ≤ k·stddev, recompute. Values are
  * buffered per group (like collect_list — per-group cardinality must
  * fit an executor; for per-image stats that is the image size).
  */
object SigmaClip {

  final case class Stats(mean: Double, stddev: Double, n: Long)

  final class SigmaClipAgg(k: Double, iters: Int)
      extends Aggregator[Double, Vector[Double], Stats] {
    override def zero: Vector[Double] = Vector.empty
    override def reduce(b: Vector[Double], v: Double): Vector[Double] = b :+ v
    override def merge(a: Vector[Double], b: Vector[Double]): Vector[Double] =
      a ++ b

    override def finish(values: Vector[Double]): Stats = {
      var kept = values
      var m = mean(kept)
      var s = stddevSamp(kept, m)
      var i = 0
      while (i < iters && kept.nonEmpty) {
        val lo = m - k * s
        val hi = m + k * s
        kept = kept.filter(v => v >= lo && v <= hi)
        m = mean(kept)
        s = stddevSamp(kept, m)
        i += 1
      }
      Stats(m, s, kept.length.toLong)
    }

    private def mean(xs: Vector[Double]): Double =
      if (xs.isEmpty) Double.NaN else xs.sum / xs.length
    private def stddevSamp(xs: Vector[Double], m: Double): Double =
      if (xs.length < 2) Double.NaN
      else math.sqrt(xs.map(v => (v - m) * (v - m)).sum / (xs.length - 1))

    override def bufferEncoder: Encoder[Vector[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Vector[Double]]()
    override def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
  }

  /** Column form: `sigma_clip(col, k, iters)` usable in groupBy.agg. */
  def sigma_clip(c: Column, k: Double, iters: Int): Column =
    udaf(new SigmaClipAgg(k, iters)).apply(c)
}
