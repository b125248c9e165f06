package graft.functions

import scala.collection.immutable.SortedSet

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (k-minimum-values) distinct-count sketch as a typed
  * `Aggregator` UDAF — the §2.8 "custom aggregate" slot of the operator
  * inventory, and the sketch family behind containment/cardinality
  * estimation at 100 TB (cf. GB-KMV, ICDE 2019).
  *
  * State is the k smallest DISTINCT 60-bit hash values seen — a
  * bounded O(k) buffer per group regardless of group size, and min-k of
  * a set is order-independent, so the sketch is bit-deterministic
  * across partitionings and engines (oracle twin:
  * `list_sort(list_distinct(list(h)))[1:k]`). Partial aggregation
  * (map-side combine) applies as with any Aggregator: partitions
  * sketch locally, only k values per (group, partition) shuffle.
  *
  * Estimator: with U = 2^60 the hash space, distinct ≈ (k−1)·U / kth
  * min when the buffer is full; exact count when fewer than k distinct
  * values were seen.
  */
object KmvSketch {

  val HashSpace: Double = math.pow(2.0, 60)

  class Agg(k: Int) extends Aggregator[Long, SortedSet[Long], Seq[Long]] {
    override def zero: SortedSet[Long] = SortedSet.empty[Long]
    override def reduce(b: SortedSet[Long], h: Long): SortedSet[Long] = {
      val added = b + h
      if (added.size > k) added.init else added
    }
    override def merge(a: SortedSet[Long], b: SortedSet[Long]): SortedSet[Long] = {
      val u = a ++ b
      if (u.size <= k) u else u.take(k)
    }
    override def finish(b: SortedSet[Long]): Seq[Long] = b.toSeq
    override def bufferEncoder: Encoder[SortedSet[Long]] =
      Encoders.kryo[SortedSet[Long]]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Aggregate column: KMV sketch (ascending k smallest distinct
    * hashes) of a LongType hash column. */
  def sketch(hashCol: Column, k: Int): Column = udaf(new Agg(k), Encoders.scalaLong)(hashCol)

  /** Distinct-count estimate from a sketch produced with parameter k. */
  def estimate(sketch: Seq[Long], k: Int): Double =
    if (sketch.size < k) sketch.size.toDouble
    else (k - 1).toDouble * HashSpace / sketch.last.toDouble
}
