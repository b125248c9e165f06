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

  /** MERGE INTO semantics over key-addressed tables (the reference only
    * SKIPS duplicates — `ON CONFLICT DO NOTHING`; upsert is the other
    * half of the lifecycle): rows of `batch` REPLACE same-key rows of
    * `table`, everything else is kept/inserted. One full-outer join on
    * the key, batch-wins via coalesce — the shuffle is keyed and
    * co-partitionable with the table's layout (bucket both sides by
    * `keyCol` and even that exchange disappears). Last-wins within the
    * batch must be resolved by the CALLER (pass a key-unique batch) —
    * silent arbitrary-row-wins is how upsert pipelines corrupt data. */
  def upsert(table: DataFrame, batch: DataFrame, keyCol: String): DataFrame = {
    val dataCols = table.columns.filterNot(_ == keyCol)
    require(batch.columns.sorted.sameElements(table.columns.sorted),
      s"upsert batch schema ${batch.columns.mkString(",")} != table ${table.columns.mkString(",")}")
    // row ownership follows the KEY, not per-column coalesce — a batch
    // row carrying a legitimate NULL must not leak the old value
    val marked = batch.withColumn("__from_batch", lit(true))
    table.as("t").join(marked.as("b"), Seq(keyCol), "full_outer")
      .select(col(keyCol) +:
        dataCols.map(c =>
          when(col("__from_batch").isNotNull, col(s"b.$c")).otherwise(col(s"t.$c")).as(c)): _*)
  }
}
