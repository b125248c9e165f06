package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic

/** The streaming half of the project's internal-API bridging (the
  * Column↔Expression half lives in `graftbridge.GraftBridge`), isolated
  * in this package so the `private[sql]` scope is satisfied — the same
  * technique every production DSv1 sink (Delta's `DeltaSink`,
  * spark-redshift) uses.
  *
  * Inside `Sink.addBatch` the incoming DataFrame is backed by the
  * streaming query's `IncrementalExecution`; feeding it to a batch
  * writer (`DataFrameWriter`, `VectorTable.insert`) would re-plan it as
  * a streaming query and fail ("queries with streaming sources must be
  * executed with writeStream.start()"). The sanctioned rewrap is to
  * take the ALREADY-PLANNED micro-batch rows (`queryExecution.toRdd`)
  * and re-wrap them as a plain batch DataFrame — one narrow map, no
  * extra action, no driver materialization (contrast `MemorySink`'s
  * `data.collect()`).
  */
object BatchShim {

  /** Re-wraps a micro-batch DataFrame as a batch one. The defensive
    * `copy()` is required: `toRdd` yields buffer-backed `UnsafeRow`s
    * that downstream buffering operators (sorts, joins) would otherwise
    * alias as the buffer is reused. */
  def asBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd.map(_.copy()), df.schema, isStreaming = false)
  }

}
