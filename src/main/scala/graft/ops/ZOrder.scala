package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping.
  *
  * Sorting a table by the bit-interleaving of two (or more) key columns
  * clusters rows so that EVERY interleaved dimension has narrow
  * min/max ranges per file/row-group — a box predicate on any of the
  * dimensions then prunes most of the data at scan time from parquet
  * statistics alone. A single-column sort gives perfect pruning on one
  * dimension and none on the others; z-order spreads the pruning power
  * across dimensions (cf. the Delta/Iceberg OPTIMIZE ZORDER operation).
  *
  * The z-value is built from plain `shiftleft`/`bitwiseAND`/`+`
  * expressions — fully codegen'd, no UDF — and the layout write is one
  * range-partitioned sort: exactly the one-time cost any clustering
  * investment pays, amortized over every subsequent selective scan.
  */
object ZOrder {

  /** Bit-interleaved z-value of two non-negative int columns, using the
    * low `bits` of each: bit i of `a` → bit 2i, bit i of `b` → 2i+1.
    * Inputs are widened to long BEFORE shifting: `shiftleft` on an int
    * operand wraps mod 32, so bits ≥ 16 would silently fold into the
    * int sign bit with 32-bit inputs. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1,31], got $bits")
    val (al, bl) = (a.cast("long"), b.cast("long"))
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ + _)
  }

  /** Writes `df` clustered by the z-order of (colA, colB): range
    * partition on the z-value (so files tile the z-curve) and sort
    * within partitions. Returns the written path. */
  def writeZOrdered(df: DataFrame, colA: String, colB: String, bits: Int,
      path: String, numFiles: Int): String = {
    df.withColumn("__z", zValue(col(colA), col(colB), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
    path
  }

  /** Rows actually produced by the scan leaves of an executed plan —
    * after parquet row-group pruning and pushed filters — used by the
    * specs to prove the z-layout skips data a row-ordered layout reads. */
  def scanOutputRows(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.metrics.get("numOutputRows").map(_.value)).sum
  }
}
