package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact distinct-count over a dense non-negative integer keyspace via
  * mergeable bitmaps — the scale-path alternative to `countDistinct`.
  *
  * `countDistinct` shuffles every distinct raw key (keyed partial
  * aggregation); at 100 TB of events keyed by user/order ids that is a
  * full shuffle of the id universe PER GROUP. A bitmap aggregator ships
  * one fixed-size bit array per (group, partition) instead — the
  * merge is bitwise OR, associative and commutative, and the result is
  * EXACT, not approximate (this is ClickHouse/Doris `bitmap_union`
  * territory; for sparse id spaces swap the dense word array for a
  * compressed bitmap — the plan shape is identical).
  *
  * The buffer grows lazily to the highest key seen in the partition, so
  * memory tracks the actual key range: ceil(maxKey/64) longs.
  */
object BitmapDistinct {

  class Agg(maxKey: Long) extends Aggregator[Long, Array[Long], Long] {
    require(maxKey > 0 && maxKey <= (1L << 32), s"dense bitmap needs a bounded keyspace, got $maxKey")

    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(b: Array[Long], key: Long): Array[Long] = {
      require(key >= 0 && key < maxKey, s"key $key outside dense range [0, $maxKey)")
      val word = (key >> 6).toInt
      val grown = if (word < b.length) b else java.util.Arrays.copyOf(b, word + 1)
      grown(word) |= 1L << (key & 63)
      grown
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      val (big, small) = if (a.length >= b.length) (a, b) else (b, a)
      var i = 0
      while (i < small.length) { big(i) |= small(i); i += 1 }
      big
    }

    override def finish(b: Array[Long]): Long = {
      var n = 0L
      var i = 0
      while (i < b.length) { n += java.lang.Long.bitCount(b(i)); i += 1 }
      n
    }

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Aggregate column: exact distinct count of a LongType key column
    * with keys in [0, maxKey). */
  def distinct(keyCol: Column, maxKey: Long): Column =
    udaf(new Agg(maxKey), Encoders.scalaLong)(keyCol)
}
