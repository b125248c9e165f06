package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries heavy-hitters sketch as a typed `Aggregator` UDAF — the
  * frequent-items primitive of a training-data pipeline (vocabulary
  * stats, hot-key detection, boilerplate phrase mining) at 100 TB.
  *
  * State is a counter map bounded at `capacity` entries per group, so
  * partial aggregation ships O(capacity) rows per (group, partition) —
  * never the raw token stream. Merging two sketches is the standard MG
  * merge (add counters, then subtract the (capacity+1)-th largest count
  * from all and drop non-positives), which preserves the deterministic
  * error bound: every estimate undercounts the true frequency by at
  * most N/(capacity+1), where N is the total stream length, and every
  * item with true count > N/(capacity+1) survives.
  *
  * When `capacity` ≥ the number of distinct items, no decrement ever
  * fires and the sketch is EXACT — the oracle-checked query entry runs
  * in that regime (fixture vocabulary ≈ 30 ≪ 64), while the error-bound
  * regime is property-tested in HeavyHittersSpec with small capacities.
  */
object HeavyHitters {

  class Agg(capacity: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
      b.get(item) match {
        case Some(c) => b.updated(item, c + 1)
        case None if b.size < capacity => b.updated(item, 1L)
        case None => decrement(b, 1L)
      }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = b.foldLeft(a) { case (acc, (k, v)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + v)
      }
      if (sum.size <= capacity) sum
      else {
        // subtract the (capacity+1)-th largest count, drop non-positives
        val kth = sum.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
        sum.flatMap { case (k, v) => if (v > kth) Some(k -> (v - kth)) else None }
      }
    }

    private def decrement(b: Map[String, Long], by: Long): Map[String, Long] =
      b.flatMap { case (k, v) => if (v > by) Some(k -> (v - by)) else None }

    override def finish(b: Map[String, Long]): Map[String, Long] = b
    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Aggregate column: MG counter map of a StringType item column. */
  def sketch(itemCol: Column, capacity: Int): Column =
    udaf(new Agg(capacity), Encoders.STRING)(itemCol)
}
