package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join at scale.
  *
  * The naive formulation — `points JOIN intervals ON p BETWEEN lo AND
  * hi` — has no equi-key, so Spark plans a broadcast-nested-loop (or a
  * cartesian product): O(n·m) comparisons, a non-starter at 100 TB.
  * This operator bins the domain into fixed-width buckets: each point
  * maps to one bucket, each interval explodes to the buckets it
  * overlaps, the join becomes an EQUI-join on bucket id (hash shuffle,
  * AQE-managed), and the exact BETWEEN predicate refines the bucket
  * matches. Cost: O(n + m·spans + matches) — `binWidth` trades
  * interval replication against bucket selectivity; set it near the
  * median interval length.
  */
object RangeJoin {

  /** Inner join of `points` (value column `p`) with `intervals`
    * (columns `lo`, `hi`, inclusive bounds) on lo <= p <= hi. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      p: String, lo: String, hi: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val pb = points.withColumn("__bin", floor(col(p) / binWidth))
    val ib = intervals.withColumn("__bin",
      explode(sequence(floor(col(lo) / binWidth), floor(col(hi) / binWidth))))
    pb.join(ib, Seq("__bin"))
      .where(col(p) >= col(lo) && col(p) <= col(hi))
      .drop("__bin")
  }
}
