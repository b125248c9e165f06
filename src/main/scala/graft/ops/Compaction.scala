package graft.ops

import org.apache.spark.sql.DataFrame

/** Small-file compaction — the maintenance operator every streaming or
  * fine-partitioned ingest eventually needs. Micro-batches and
  * per-partition writers leave thousands of KB-sized parquet files;
  * at 100 TB that means task-scheduling overhead and footer reads
  * dominating scans. Compaction rewrites a directory into files of
  * roughly `targetFileRows` rows (at real scale: target *bytes*,
  * derived from the table's average row width) with one
  * coalesce-style shuffle-free repartition when shrinking, preserving
  * content exactly — the correctness contract the oracle checks via an
  * order-independent checksum.
  */
object Compaction {

  /** Rewrites `df` (typically a fragmented directory read) into
    * ~ceil(count/targetFileRows) files at `outPath`. Uses coalesce — a
    * NARROW dependency, no shuffle: shrinking file counts must not pay
    * a full data shuffle. coalesce cannot INCREASE the partition count,
    * so when the input has fewer partitions than the target the output
    * has that many files instead (growing file counts is splitting, not
    * compaction). Returns the ACTUAL number of data files written. */
  def compact(df: DataFrame, outPath: String, targetFileRows: Long): Int = {
    val n = df.count()
    val files = math.max(1, math.ceil(n.toDouble / targetFileRows).toInt)
    df.coalesce(files).write.mode("overwrite").parquet(outPath)
    val p = new org.apache.hadoop.fs.Path(outPath)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    fs.listStatus(p).count(s => s.getPath.getName.startsWith("part-"))
  }
}
