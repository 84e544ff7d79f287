package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable t-digest buffer: merged centroids (means/weights, sorted by
  * mean) plus a fixed-capacity unmerged point buffer (`buf`, first `n`
  * slots live) that is folded in when full. The buffer array is mutated
  * in place between serialization boundaries — Spark's typed-aggregator
  * contract only serializes at partial-output/shuffle edges, and an
  * immutable `buf :+ x` would copy the whole array on EVERY input row.
  */
final case class TDigestBuf(means: Array[Double], weights: Array[Double],
    buf: Array[Double], n: Int)

/** Mergeable t-digest quantile sketch (Dunning & Ertl, "Computing
  * extremely accurate quantiles using t-digests") as a typed Spark
  * [[Aggregator]] — the declared 100 TB path for the A8
  * describe/quantile family: the exact `percentile` aggregate buffers
  * EVERY value of a group in the aggregation buffer (a hot group OOMs an
  * executor), and the sorted-rank form pays a full sort shuffle. The
  * digest buffer is O(compression) regardless of group size, partial
  * aggregation combines map-side, and merges are associative-enough that
  * rank error stays bounded (~1/compression at the median, tighter at the
  * tails by the k1 scale function's q(1-q) taper).
  *
  * Approximate by design, so there is no DuckDB oracle twin — accuracy
  * versus the exact quantiles is pinned in TDigestSpec instead
  * (rows-only correctness entry, like approx_sketch_stats).
  *
  * Centroid merging uses the k1 scale function
  * k(q) = δ/(2π)·asin(2q−1): adjacent centroids merge while their
  * combined k-span is ≤ 1, giving ~δ centroids with fine resolution at
  * the tails. Quantile queries interpolate between centroid midpoints.
  */
class TDigestAgg(compression: Double, quantiles: Seq[Double])
    extends Aggregator[Double, TDigestBuf, Array[Double]] {
  require(compression >= 20, s"compression $compression too small")
  require(quantiles.nonEmpty && quantiles.forall(q => q >= 0 && q <= 1))

  private val bufLimit = 512

  override def zero: TDigestBuf =
    TDigestBuf(Array.empty, Array.empty, new Array[Double](bufLimit), 0)

  override def reduce(b: TDigestBuf, x: Double): TDigestBuf = {
    // deserialized buffers may arrive with a truncated array — regrow
    val withRoom =
      if (b.buf.length >= bufLimit) b
      else {
        val arr = new Array[Double](bufLimit)
        Array.copy(b.buf, 0, arr, 0, b.n)
        TDigestBuf(b.means, b.weights, arr, b.n)
      }
    withRoom.buf(withRoom.n) = x
    val filled = withRoom.copy(n = withRoom.n + 1) // shares the array
    if (filled.n >= bufLimit) {
      val c = compress(filled.means, filled.weights,
        filled.buf, filled.n)
      TDigestBuf(c.means, c.weights, filled.buf, 0) // reuse the array
    } else filled
  }

  override def merge(a: TDigestBuf, b: TDigestBuf): TDigestBuf = {
    val means = a.means ++ b.means ++ a.buf.take(a.n) ++ b.buf.take(b.n)
    val weights = a.weights ++ b.weights ++ Array.fill(a.n + b.n)(1.0)
    compressPairs(means, weights)
  }

  override def finish(b: TDigestBuf): Array[Double] = {
    val d = compress(b.means, b.weights, b.buf, b.n)
    quantiles.map(q => quantileOf(d.means, d.weights, q)).toArray
  }

  override def bufferEncoder: Encoder[TDigestBuf] =
    Encoders.product[TDigestBuf]
  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()

  private def compress(means: Array[Double], weights: Array[Double],
                       buf: Array[Double], n: Int): TDigestBuf =
    compressPairs(means ++ buf.take(n), weights ++ Array.fill(n)(1.0))

  /** One merge pass over centroids sorted by mean: the k1 scale function
    * caps each merged centroid's q-span at 1/δ of k-space.
    */
  private def compressPairs(means: Array[Double],
                            weights: Array[Double]): TDigestBuf = {
    if (means.isEmpty)
      return TDigestBuf(Array.empty, Array.empty, Array.empty, 0)
    val order = means.indices.sortBy(means(_))
    val total = weights.sum
    def k(q: Double): Double = {
      val qc = math.min(1.0, math.max(0.0, q))
      compression / (2 * math.Pi) * math.asin(2 * qc - 1)
    }
    val outM = scala.collection.mutable.ArrayBuffer[Double]()
    val outW = scala.collection.mutable.ArrayBuffer[Double]()
    var curM = means(order.head)
    var curW = weights(order.head)
    var wSoFar = 0.0
    for (i <- 1 until order.length) {
      val m = means(order(i)); val w = weights(order(i))
      val qLeft = wSoFar / total
      val qRight = (wSoFar + curW + w) / total
      if (k(qRight) - k(qLeft) <= 1.0) {
        curM = (curM * curW + m * w) / (curW + w)
        curW += w
      } else {
        outM.append(curM); outW.append(curW)
        wSoFar += curW
        curM = m; curW = w
      }
    }
    outM.append(curM); outW.append(curW)
    TDigestBuf(outM.toArray, outW.toArray, Array.empty, 0)
  }

  /** Quantile by interpolation between centroid midpoints (each centroid
    * is assumed to straddle half its weight on each side of its mean).
    */
  private def quantileOf(means: Array[Double], weights: Array[Double],
                         q: Double): Double = {
    if (means.isEmpty) return Double.NaN
    if (means.length == 1) return means(0)
    val total = weights.sum
    val target = q * total
    var cum = 0.0
    var i = 0
    while (i < means.length) {
      val mid = cum + weights(i) / 2.0
      if (target <= mid) {
        if (i == 0) return means(0)
        val prevMid = cum - weights(i - 1) / 2.0
        val frac = (target - prevMid) / (mid - prevMid)
        return means(i - 1) + frac * (means(i) - means(i - 1))
      }
      cum += weights(i)
      i += 1
    }
    means.last
  }
}

object TDigestAgg {
  /** Column form: array of approximate quantiles of `valueCol`. */
  def tdigestQuantiles(valueCol: Column, compression: Double,
                       quantiles: Seq[Double]): Column =
    udaf(new TDigestAgg(compression, quantiles)).apply(valueCol)
}
