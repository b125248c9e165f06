package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Stable global row numbering without a global sort bottleneck.
  *
  * `row_number() OVER (ORDER BY …)` with no PARTITION BY plans a
  * single-partition window — every row funnels through one task, the
  * canonical scale-killer. The distributed equivalent is the two-pass
  * offset scheme (what `RDD.zipWithIndex` does, expressed on Datasets):
  * range-partition + local sort, count rows per partition (pass 1),
  * prefix-sum the counts on the driver (P integers, not data), then
  * assign `offset(p) + local index` map-side (pass 2). Total cost: one
  * range shuffle + one tiny count job; no stage ever sees more than its
  * own partition.
  *
  * Use cases: assigning stable ids to a 100 TB document corpus,
  * deterministic sharding (`rn % nShards`), resumable exports.
  */
object Sharding {

  /** Appends `outCol` = 0-based global rank of `orderCol` (which must
    * be unique for a deterministic result).
    *
    * The partition index is taken from RDD `mapPartitionsWithIndex`
    * closures, NOT from `TaskContext.getPartitionId()`: the task id is
    * a runtime property that collapses to 0 when a downstream
    * `coalesce(1)` fuses the stage (which silently restarts numbering
    * per parent partition — found the hard way), while the RDD
    * partition index is baked per parent partition at plan time and
    * survives any downstream re-wiring. */
  def globalRowNumber(df: DataFrame, orderCol: String, outCol: String = "rn",
      numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(parts, col(orderCol))
      .sortWithinPartitions(orderCol).rdd
    // pass 1: per-partition row counts (P integers to the driver, not data)
    val counts = sorted.mapPartitionsWithIndex { (pid, it) =>
      Iterator(pid -> it.size.toLong)
    }.collect().toMap
    val offsets = (0 until parts).scanLeft(0L)((acc, p) => acc + counts.getOrElse(p, 0L))
    val bc = spark.sparkContext.broadcast(offsets.toArray)
    val outSchema = StructType(df.schema.fields :+ StructField(outCol, LongType, nullable = false))
    // pass 2: map-side assignment from the broadcast prefix sums
    val numbered = sorted.mapPartitionsWithIndex { (pid, it) =>
      var i = bc.value(pid)
      it.map { r => val out = Row.fromSeq(r.toSeq :+ i); i += 1; out }
    }
    spark.createDataFrame(numbered, outSchema)
  }
}
