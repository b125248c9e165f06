package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the single latest
  * right row of the same key with `ts_right <= ts_left` — the join a
  * feature-store / event-attribution pipeline needs ("the user's most
  * recent profile/view as of this event").
  *
  * Spark has no native as-of join; rather than a custom physical
  * operator, this composes built-ins (preference order (a), see
  * SURVEY.md §7.3): tag and union both sides, one window pass per key
  * ordered by (ts, side), carry the right columns forward with
  * `last(ignoreNulls)`, keep left rows. One shuffle on the key and a
  * linear scan per key — O(n log n) total, vs the O(n·m)-per-key
  * explosion of the naive range-join formulation, and it inherits
  * Spark's spill/AQE handling. Ties (equal ts) match the right row
  * (inclusive <=), the same convention as DuckDB's
  * `ASOF JOIN ... ON l.ts >= r.ts`, which is the differential oracle.
  */
object AsOf {

  /** `carryCols` are the right-side columns to attach, suffixed
    * `_asof` in the output. `right` must be unique per (key, ts) for
    * deterministic results — pre-aggregate if it is not. */
  def join(left: DataFrame, right: DataFrame, key: String, ts: String,
      carryCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.withColumn("__is_l", lit(1))
    val r = right.select(
      (col(key) +: col(ts) +: carryCols.map(c => col(c).as(s"__r_$c"))): _*)
      .withColumn("__is_l", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key).orderBy(col(ts).asc, col("__is_l").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = carryCols.foldLeft(u) { (df, c) =>
      df.withColumn(s"__r_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    carried.where(col("__is_l") === 1)
      .select(leftCols.map(col) ++ carryCols.map(c => col(s"__r_$c").as(s"${c}_asof")): _*)
  }
}
