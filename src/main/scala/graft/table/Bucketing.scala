package graft.table

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table helpers for co-located joins.
  *
  * At 100 TB the dominant recurring shuffle is re-partitioning a big
  * table by the same join/dedup key on every run. Writing the table
  * bucketed (hash-partitioned into N files per partition, with the
  * bucket id recorded in the catalog) makes every later equi-join or
  * aggregation on the bucket key shuffle-free on that side: Spark
  * reads each bucket as one task already partitioned by the key. The
  * vector table's natural bucket key is `id` (dedup anti-join); the
  * fact tables' are their join keys.
  *
  * Trade-offs: bucketed writes go through the session catalog
  * (`saveAsTable`), bucket counts must match across co-joined tables,
  * and too-few buckets cap parallelism — pick N ≈ cluster cores /
  * concurrent queries.
  */
object Bucketing {

  /** Writes `df` as a bucketed+sorted catalog table (overwrite). */
  def writeBucketed(df: DataFrame, table: String, nBuckets: Int, keyCols: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** True when the executed plan contains no shuffle exchange — the
    * co-location check for bucketed joins (run AFTER an action). */
  def shuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
