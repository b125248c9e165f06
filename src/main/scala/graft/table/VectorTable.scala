package graft.table

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.VectorSchema

/** A named, Parquet-backed vector table — the Spark-native counterpart of
  * the reference's one-`.duckdb`-file-per-name model (`DuckVDB`,
  * duckvdb.py:17-45; `/db/{name}.duckdb`, vdb.py:15-16).
  *
  * Storage is a Parquet directory (columnar at rest, vectorized reads,
  * partition-parallel writes — SURVEY.md §1.4). Uniqueness of `id` is
  * enforced by the insert path's anti-join (the reference's
  * `ON CONFLICT (id) DO NOTHING`, duckvdb.py:56-61), not a constraint.
  * Single-writer semantics, matching the reference's per-container file
  * model (SURVEY.md §7.4).
  */
class VectorTable(spark: SparkSession, val root: String, val dim: Int) {

  private def hadoopPath = new Path(root)
  private def fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Idempotent create (reference `CREATE TABLE IF NOT EXISTS`,
    * duckvdb.py:30-32); `overwrite=true` mirrors the drop-and-recreate
    * `new_table` flag (duckvdb.py:26-28). */
  def create(overwrite: Boolean = false): this.type = {
    if (overwrite) drop()
    if (!exists) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], VectorSchema.schema)
        .write.mode("overwrite").parquet(root)
    }
    this
  }

  /** Idempotent drop (duckvdb.py:34-35). */
  def drop(): Unit = if (exists) fs.delete(hadoopPath, true)

  def exists: Boolean = fs.exists(hadoopPath)

  /** The table as a DataFrame. Schema pinned so an empty table still
    * reads with the contract schema. */
  def df: DataFrame = spark.read.schema(VectorSchema.schema).parquet(root)

  /** Dedup insert — the reference's `INSERT … ON CONFLICT (id) DO NOTHING`
    * (duckvdb.py:56-61) as a left-anti join + append (SURVEY.md §2.3 J1):
    * first-wins within the batch, skip ids already present.
    *
    * Scale notes: the anti-join is the only wide operation; the existing
    * side is projected to `id` only (column-pruned parquet scan), so at
    * 100 TB the shuffle carries just the key column. Embedding dim is
    * validated inline via `raise_error` — a streaming one-pass check, no
    * extra action (the reference errors on dim mismatch at cast time,
    * duckvdb.py:104).
    */
  def insert(batch: DataFrame): Unit = {
    val checked = batch
      .select(VectorSchema.ID, VectorSchema.METADATA, VectorSchema.EMBEDDING)
      .withColumn(VectorSchema.EMBEDDING,
        when(size(col(VectorSchema.EMBEDDING)) === dim, col(VectorSchema.EMBEDDING))
          .otherwise(raise_error(concat(
            lit(s"embedding dim mismatch: expected $dim, got "),
            size(col(VectorSchema.EMBEDDING)).cast("string")))))
    val deduped = checked.dropDuplicates(VectorSchema.ID)
    val fresh =
      if (isEmpty) deduped
      else deduped.join(df.select(VectorSchema.ID), Seq(VectorSchema.ID), "left_anti")
    fresh.write.mode("append").parquet(root)
  }

  private def isEmpty: Boolean = df.isEmpty

  /** Row count (reference `num_rows`, duckvdb.py:122-123). */
  def numRows: Long = df.count()

  /** Bulk load from an external Parquet path (reference
    * `load_from_parquet` CTAS, duckvdb.py:43-45). The reference also
    * builds its HNSW index here; our ANN analogue is the LSH index in
    * `graft.ops.Ann`, built batch-style on demand. */
  def loadFromParquet(path: String): Unit = {
    spark.read.parquet(path)
      .select(VectorSchema.ID, VectorSchema.METADATA, VectorSchema.EMBEDDING)
      .write.mode("overwrite").parquet(root)
  }
}
