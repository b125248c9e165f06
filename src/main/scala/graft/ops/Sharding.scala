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

  /** Appends the inclusive running total `cum_<c>` (LongType) of each
    * LongType column in `sumCols`, taken in ascending `orderCol` order
    * (which must be unique — intra-tie order is undefined) — i.e. a
    * distributed CDF / prefix-scan.
    *
    * Same two-pass offset scheme as [[globalRowNumber]]: the naive
    * `sum(c) OVER (ORDER BY v)` plans a single-partition window (one
    * task sees every row); here pass 1 ships P×C partial sums to the
    * driver, pass 2 resumes each partition from its broadcast offset
    * vector. This is the backbone for whole-distribution statistics
    * at corpus scale: empirical CDFs (KS tests), threshold sweeps
    * (decision stumps, ROC curves), quantile tables. */
  def prefixSums(df: DataFrame, orderCol: String, sumCols: Seq[String],
      numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val idx = sumCols.map(df.schema.fieldIndex).toArray
    val sorted = df.repartitionByRange(parts, col(orderCol))
      .sortWithinPartitions(orderCol).rdd
    // pass 1: per-partition column sums (P vectors of C longs, not data)
    val partSums = sorted.mapPartitionsWithIndex { (pid, it) =>
      val acc = new Array[Long](idx.length)
      it.foreach { r =>
        var j = 0
        while (j < idx.length) { acc(j) += r.getLong(idx(j)); j += 1 }
      }
      Iterator(pid -> acc)
    }.collect().toMap
    val zero = new Array[Long](idx.length)
    val offsets = (0 until parts).scanLeft(zero) { (acc, p) =>
      val s = partSums.getOrElse(p, zero)
      Array.tabulate(idx.length)(j => acc(j) + s(j))
    }
    val bc = spark.sparkContext.broadcast(offsets.toArray)
    val outSchema = StructType(df.schema.fields ++
      sumCols.map(c => StructField(s"cum_$c", LongType, nullable = false)))
    // pass 2: resume the scan from the broadcast offsets, map-side
    val scanned = sorted.mapPartitionsWithIndex { (pid, it) =>
      val run = bc.value(pid).clone()
      it.map { r =>
        var j = 0
        while (j < idx.length) { run(j) += r.getLong(idx(j)); j += 1 }
        Row.fromSeq(r.toSeq ++ run.clone().toSeq)
      }
    }
    spark.createDataFrame(scanned, outSchema)
  }
}
