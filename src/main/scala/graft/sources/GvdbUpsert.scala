package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.VectorSchema
import graft.plans.GvdbRowLevel
import graft.table.VectorTable

/** Keyed upsert over a gvdb table: batch rows REPLACE same-id table
  * rows, new ids insert — the `vdb_upsert` semantics (tombstone-free:
  * a file-group copy-on-write through [[GvdbRowLevel.rewrite]], so
  * only the part files holding replaced ids rewrite; an all-new batch
  * is a pure append). This is the streaming UPDATE-mode sink's apply
  * (`GvdbStreamingWrite` with `upsert`) and the batch
  * `.option("upsert", "true")` write path.
  *
  * Within a batch, ids are deduplicated first-wins
  * (`dropDuplicates` — micro-batch internal ordering is not defined,
  * the same contract as the insert path). A batch id that was
  * previously DELETED resurrects: its dead raw row's file is a victim
  * (the post-image contract in [[graft.plans.GvdbMergeCommand]]), so
  * the stale tombstone leaves with the file and the new row is
  * visible. */
object GvdbUpsert {

  def apply(spark: SparkSession, root: String, data: DataFrame,
      dimOpt: Option[Int]): Unit = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.core.WriterLock.withLock(fs, root) {
      val shaped = GvdbWrite.shape(data).dropDuplicates(VectorSchema.ID)
      val table = new VectorTable(spark, root, dimOpt.getOrElse(1))
      if (!table.exists) {
        GvdbWrite.insert(spark, root, shaped, overwrite = false, dimOpt)
      } else {
        val ids = Seq(VectorSchema.ID)
        val tgt = table.df.select(VectorSchema.ID, VectorSchema.METADATA,
          VectorSchema.EMBEDDING)
        val copies = tgt.join(shaped.select(VectorSchema.ID), ids, "left_anti")
          .withColumn(GvdbRowLevel.Origin, col(VectorSchema.ID))
        val updates = shaped.join(tgt.select(VectorSchema.ID), ids, "left_semi")
          .withColumn(GvdbRowLevel.Origin, col(VectorSchema.ID))
        val inserts = shaped.join(tgt.select(VectorSchema.ID), ids, "left_anti")
          .withColumn(GvdbRowLevel.Origin,
            lit(null).cast(org.apache.spark.sql.types.StringType))
        // touched = every batch id: pre-image (replaced rows' files
        // rewrite) and post-image (a dead raw duplicate of an inserted
        // id purges with its file) coincide here
        GvdbRowLevel.rewrite(spark, root,
          copies.unionByName(updates).unionByName(inserts),
          shaped.select(VectorSchema.ID))
      }
    }
  }
}
