package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: merge a delta batch into a
  * materialized per-key aggregate WITHOUT recomputing history — the
  * batch analogue of streaming state, and the only viable shape when
  * "history" is 100 TB and the nightly delta is 100 GB.
  *
  * Works for any commutative-monoid aggregate (count, sum, min, max,
  * and sketches like KMV/HLL/bitmap whose merge is union): aggregate
  * the delta alone, then full-outer-merge the two small per-key tables
  * — the recomputation never touches raw history. The result is
  * bit-identical to aggregating (history ∪ delta) from scratch, which
  * is exactly what the oracle twin checks.
  */
object Incremental {

  /** Merges two (key, cnt, sum) aggregate tables: one row per key,
    * counters added. Columns beyond `keyCols` must appear in both with
    * the same names; each is combined with `+` after null-coalescing. */
  def mergeCountSum(snapshot: DataFrame, deltaAgg: DataFrame,
      keyCols: Seq[String], valCols: Seq[String]): DataFrame = {
    val merged = snapshot.as("a").join(deltaAgg.as("b"), keyCols, "full_outer")
    val keys = keyCols.map(col)
    val vals = valCols.map { c =>
      (coalesce(col(s"a.$c"), lit(0)) + coalesce(col(s"b.$c"), lit(0))).as(c)
    }
    merged.select(keys ++ vals: _*)
  }
}
