package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Merging t-digest quantile sketch as a typed `Aggregator` UDAF
  * (Dunning & Ertl, "Computing extremely accurate quantiles using
  * t-digests", 2019; k₁ arcsine scale function, merging variant — no
  * per-point tree, just buffer + merge-compress).
  *
  * Why another quantile aggregate when `percentile_approx` exists: the
  * t-digest buffer is a ~δ-bounded, ORDER-MERGEABLE summary — digests
  * from different partitions/days/shards merge losslessly into one
  * digest with the same error envelope, which is the reaggregatable
  * rollup property the HLL/KMV sketches in this module give distinct
  * counts. Rank error concentrates at the tails as 1/δ·q(1−q), so
  * p99/p999 stay sharp where uniform-bin sketches blur.
  *
  * State is (sorted centroid means, weights) + an unmerged tail of raw
  * points, compressed whenever the tail fills or two buffers merge —
  * O(δ) per group regardless of group size, map-side combinable like
  * any Aggregator. The result is partition-order dependent (as any
  * t-digest is), so registry queries gate it by TOLERANCE against the
  * exact quantile, never by hash.
  */
object TDigestAgg {

  val Compression = 100.0
  val TailCap = 512

  case class Buf(means: Array[Double], weights: Array[Double], tail: Array[Double])

  private def kScale(q: Double): Double =
    Compression * (math.asin(2.0 * math.min(1.0, math.max(0.0, q)) - 1.0) / math.Pi + 0.5)

  /** Merge centroids + raw tail points into a freshly compressed
    * centroid list (ascending means). */
  def compress(m: Array[Double], w: Array[Double], tail: Array[Double]): (Array[Double], Array[Double]) = {
    val n = m.length + tail.length
    if (n == 0) return (Array.empty, Array.empty)
    val pairs = new Array[(Double, Double)](n)
    var i = 0
    while (i < m.length) { pairs(i) = (m(i), w(i)); i += 1 }
    var j = 0
    while (j < tail.length) { pairs(m.length + j) = (tail(j), 1.0); j += 1 }
    java.util.Arrays.sort(pairs, Ordering.by((p: (Double, Double)) => p._1))
    var total = 0.0
    i = 0
    while (i < n) { total += pairs(i)._2; i += 1 }
    val om = new ArrayBuffer[Double](256)
    val ow = new ArrayBuffer[Double](256)
    var curM = pairs(0)._1
    var curW = pairs(0)._2
    var wSoFar = 0.0
    var kLeft = kScale(0.0)
    i = 1
    while (i < n) {
      val (nm, nw) = pairs(i)
      val qRight = (wSoFar + curW + nw) / total
      if (kScale(qRight) - kLeft <= 1.0) {
        curM = (curM * curW + nm * nw) / (curW + nw)
        curW += nw
      } else {
        om += curM; ow += curW
        wSoFar += curW
        kLeft = kScale(wSoFar / total)
        curM = nm; curW = nw
      }
      i += 1
    }
    om += curM; ow += curW
    (om.toArray, ow.toArray)
  }

  /** Quantile by midpoint interpolation over the centroid chain. */
  def quantile(means: Array[Double], weights: Array[Double], q: Double): Double = {
    val n = means.length
    if (n == 0) return Double.NaN
    if (n == 1) return means(0)
    var total = 0.0
    var i = 0
    while (i < n) { total += weights(i); i += 1 }
    val target = q * total
    var cum = 0.0
    i = 0
    while (i < n) {
      val mid = cum + weights(i) / 2.0
      if (target < mid || i == n - 1) {
        if (i == 0) return means(0)
        val prevMid = cum - weights(i - 1) / 2.0
        val frac = (target - prevMid) / (mid - prevMid)
        return means(i - 1) + (means(i) - means(i - 1)) * math.min(1.0, math.max(0.0, frac))
      }
      cum += weights(i)
      i += 1
    }
    means(n - 1)
  }

  /** finish = requested quantiles ++ (centroid count) — the count lets
    * registry queries assert the O(δ) bound held through every merge. */
  class Agg(qs: Seq[Double]) extends Aggregator[Double, Buf, Seq[Double]] {
    override def zero: Buf = Buf(Array.empty, Array.empty, Array.empty)
    override def reduce(b: Buf, x: Double): Buf = {
      val tail = b.tail :+ x
      if (tail.length >= TailCap) {
        val (m, w) = compress(b.means, b.weights, tail)
        Buf(m, w, Array.empty)
      } else Buf(b.means, b.weights, tail)
    }
    override def merge(a: Buf, b: Buf): Buf = {
      val (m, w) = compress(a.means ++ b.means, a.weights ++ b.weights, a.tail ++ b.tail)
      Buf(m, w, Array.empty)
    }
    override def finish(b: Buf): Seq[Double] = {
      val (m, w) = compress(b.means, b.weights, b.tail)
      qs.map(q => quantile(m, w, q)) :+ m.length.toDouble
    }
    override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Aggregate column: t-digest quantiles (plus trailing centroid
    * count) of a DoubleType column. */
  def quantiles(valueCol: Column, qs: Seq[Double]): Column =
    udaf(new Agg(qs), Encoders.scalaDouble)(valueCol)
}
