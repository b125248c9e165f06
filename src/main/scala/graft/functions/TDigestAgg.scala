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

  /** Mutable tail buffer: `reduce` runs once per ROW, so the tail must
    * append in O(1) — an immutable `:+` copy per row is O(TailCap²)
    * allocation churn per buffer fill (measured: 2.2 GB of agg spill
    * at the 100× rollup before this was mutable). */
  case class Buf(var means: Array[Double], var weights: Array[Double],
      tail: ArrayBuffer[Double])

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
    compressPairs(pairs)
  }

  /** Weighted form: every input is a (mean, weight) centroid — a
    * weight-c point is exactly c coincident points to the scale
    * function, so digesting a VALUE CENSUS equals digesting the raw
    * multiset. */
  def compressWeighted(m: Array[Double], w: Array[Double]): (Array[Double], Array[Double]) = {
    val n = m.length
    if (n == 0) return (Array.empty, Array.empty)
    val pairs = new Array[(Double, Double)](n)
    var i = 0
    while (i < n) { pairs(i) = (m(i), w(i)); i += 1 }
    compressPairs(pairs)
  }

  private def compressPairs(pairs: Array[(Double, Double)]): (Array[Double], Array[Double]) = {
    val n = pairs.length
    java.util.Arrays.sort(pairs, Ordering.by((p: (Double, Double)) => p._1))
    var total = 0.0
    var i = 0
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
    override def zero: Buf = Buf(Array.empty, Array.empty, new ArrayBuffer[Double](16))
    override def reduce(b: Buf, x: Double): Buf = {
      b.tail += x
      if (b.tail.length >= TailCap) {
        val (m, w) = compress(b.means, b.weights, b.tail.toArray)
        b.means = m; b.weights = w; b.tail.clear()
      }
      b
    }
    override def merge(a: Buf, b: Buf): Buf = {
      val (m, w) = compress(a.means ++ b.means, a.weights ++ b.weights,
        (a.tail ++ b.tail).toArray)
      a.means = m; a.weights = w; a.tail.clear()
      a
    }
    override def finish(b: Buf): Seq[Double] = {
      val (m, w) = compress(b.means, b.weights, b.tail.toArray)
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

  /** finish = the digest itself as (means, weights) — the shard-level
    * half of a reaggregatable rollup. */
  class StateAgg extends Aggregator[Double, Buf, (Seq[Double], Seq[Double])] {
    override def zero: Buf = Buf(Array.empty, Array.empty, new ArrayBuffer[Double](16))
    override def reduce(b: Buf, x: Double): Buf = {
      b.tail += x
      if (b.tail.length >= TailCap) {
        val (m, w) = compress(b.means, b.weights, b.tail.toArray)
        b.means = m; b.weights = w; b.tail.clear()
      }
      b
    }
    override def merge(a: Buf, b: Buf): Buf = {
      val (m, w) = compress(a.means ++ b.means, a.weights ++ b.weights,
        (a.tail ++ b.tail).toArray)
      a.means = m; a.weights = w; a.tail.clear()
      a
    }
    override def finish(b: Buf): (Seq[Double], Seq[Double]) = {
      val (m, w) = compress(b.means, b.weights, b.tail.toArray)
      (m.toSeq, w.toSeq)
    }
    override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    override def outputEncoder: Encoder[(Seq[Double], Seq[Double])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Seq[Double], Seq[Double])]()
  }

  /** Weighted-point shard digest: input is a (value, weight) row — the
    * VALUE-CENSUS ingest path. Digesting `(price, cnt)` census rows
    * equals digesting the raw multiset (a weight-c centroid is c
    * coincident points to the scale function), but the expensive
    * 60M-row aggregation happens in the codegen'd census HashAggregate
    * upstream, not in this object aggregate: at the 100× rollup the
    * raw-row ObjectHashAggregate fell back to sort-based past 128 group
    * keys and spilled 2.2 GB, while the census path is spill-free.
    * Weighted points stage interleaved in the tail buffer. */
  class WeightedStateAgg extends Aggregator[(Double, Double), Buf, (Seq[Double], Seq[Double])] {
    private def flush(b: Buf): Unit = {
      val k = b.tail.length / 2
      if (k == 0) return
      val off = b.means.length
      val m = java.util.Arrays.copyOf(b.means, off + k)
      val w = java.util.Arrays.copyOf(b.weights, off + k)
      var i = 0
      while (i < k) {
        m(off + i) = b.tail(2 * i)
        w(off + i) = b.tail(2 * i + 1)
        i += 1
      }
      val (cm, cw) = compressWeighted(m, w)
      b.means = cm; b.weights = cw; b.tail.clear()
    }
    override def zero: Buf = Buf(Array.empty, Array.empty, new ArrayBuffer[Double](16))
    override def reduce(b: Buf, d: (Double, Double)): Buf = {
      b.tail += d._1
      b.tail += d._2
      if (b.tail.length >= 2 * TailCap) flush(b)
      b
    }
    override def merge(a: Buf, b: Buf): Buf = {
      flush(a); flush(b)
      val (m, w) = compressWeighted(a.means ++ b.means, a.weights ++ b.weights)
      a.means = m; a.weights = w
      a
    }
    override def finish(b: Buf): (Seq[Double], Seq[Double]) = {
      flush(b)
      (b.means.toSeq, b.weights.toSeq)
    }
    override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    override def outputEncoder: Encoder[(Seq[Double], Seq[Double])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Seq[Double], Seq[Double])]()
  }

  /** Aggregate column: per-shard digest from (value, weight) census
    * rows. */
  def digestStateWeighted(valueCol: Column, weightCol: Column): Column =
    udaf(new WeightedStateAgg,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Double)]())(
      valueCol, weightCol)

  /** Digest-of-digests: merges finished (means, weights) digests —
    * the rollup half. A weighted centroid is re-ingested by compress
    * exactly as it was emitted, so shard→rollup loses nothing beyond
    * the usual merge re-compression. finish = quantiles ++ centroid
    * count, as [[Agg]]. */
  class MergeAgg(qs: Seq[Double]) extends Aggregator[(Seq[Double], Seq[Double]), Buf, Seq[Double]] {
    override def zero: Buf = Buf(Array.empty, Array.empty, new ArrayBuffer[Double](0))
    override def reduce(b: Buf, d: (Seq[Double], Seq[Double])): Buf = {
      val (m, w) = compress(b.means ++ d._1, b.weights ++ d._2, b.tail.toArray)
      b.means = m; b.weights = w; b.tail.clear()
      b
    }
    override def merge(a: Buf, b: Buf): Buf = {
      val (m, w) = compress(a.means ++ b.means, a.weights ++ b.weights,
        (a.tail ++ b.tail).toArray)
      a.means = m; a.weights = w; a.tail.clear()
      a
    }
    override def finish(b: Buf): Seq[Double] = {
      val (m, w) = compress(b.means, b.weights, b.tail.toArray)
      qs.map(q => quantile(m, w, q)) :+ m.length.toDouble
    }
    override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Aggregate column: per-shard digest state. */
  def digestState(valueCol: Column): Column =
    udaf(new StateAgg, Encoders.scalaDouble)(valueCol)

  /** Aggregate column: quantiles (+ centroid count) from merged shard
    * digests produced by [[digestState]] (pass the struct's fields —
    * a tuple-encoded udaf takes its fields as separate arguments). */
  def mergeDigests(meansCol: Column, weightsCol: Column, qs: Seq[Double]): Column =
    udaf(new MergeAgg(qs),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Seq[Double], Seq[Double])]())(
      meansCol, weightsCol)
}
