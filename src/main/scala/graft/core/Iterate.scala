package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Lineage management for iterative DataFrame loops (star-contraction
  * components, PageRank/HITS/label-propagation rounds).
  *
  * Every such loop must cut lineage per round — the k-th round's
  * un-truncated logical plan nests all previous rounds and
  * analysis/codegen goes exponential long before the (small) state
  * table does. The r5 review flagged the previous mechanism
  * (`localCheckpoint` + unpersist-when-superseded): a locally
  * checkpointed RDD has NO lineage, so on a preempted/decommissioned
  * executor a lost block is unrecoverable — and unpersisting one emits
  * the truncated-lineage WARN on every round of every loop.
  *
  * [[cut]] therefore prefers a RELIABLE checkpoint: the round is
  * persisted, written to the context's checkpoint directory, and the
  * scratch blocks dropped — a lost partition re-reads the checkpoint
  * file, surviving executor loss. On a local master with no directory
  * configured, one is auto-created under java.io.tmpdir (removed on
  * JVM exit); on a CLUSTER master the deployer must `setCheckpointDir`
  * to a shared path (HDFS/object store) — if unset, [[cut]] falls back
  * to `localCheckpoint` and documents the executor-loss exposure
  * rather than silently writing executor-local temp paths that other
  * nodes cannot read.
  *
  * [[drop]] releases a SUPERSEDED round (checkpoint files deleted, or
  * blocks unpersisted on the fallback path); the FINAL round that the
  * returned lazy plan still reads must instead be registered with
  * [[PlanCache.registerRdd]] — `PlanCache.release` deletes its files
  * the same way once the caller has materialized every result. */
object Iterate {

  /** Idempotently pick a scratch checkpoint dir for local masters. */
  private def ensureCheckpointDir(sc: org.apache.spark.SparkContext): Boolean =
    synchronized {
      if (sc.getCheckpointDir.isDefined) true
      else if (!sc.isLocal) false
      else {
        val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
        sc.setCheckpointDir(dir.toString)
        val f = dir.toFile
        Runtime.getRuntime.addShutdownHook(new Thread(() => {
          def rm(x: java.io.File): Unit = {
            Option(x.listFiles).foreach(_.foreach(rm)); x.delete(); ()
          }
          rm(f)
        }))
        true
      }
    }

  /** Cut lineage after an iterative round. Reliable checkpoint when a
    * checkpoint dir exists (see class doc), eager either way: the
    * returned frame is materialized and its plan is a flat scan. The
    * round is persisted around the checkpoint so the eager
    * materialization and the checkpoint-file write don't compute the
    * round's join twice; the scratch blocks are dropped immediately
    * (the data now lives in the checkpoint files). */
  def cut(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    if (ensureCheckpointDir(sc)) {
      df.persist(StorageLevel.MEMORY_AND_DISK)
      val out = df.checkpoint()
      df.unpersist(blocking = false)
      out
    } else df.localCheckpoint()
  }

  /** The RDD behind a [[cut]] frame — the handle needed to release it. */
  def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }

  /** Release one checkpointed RDD: delete reliable-checkpoint files
    * and/or unpersist blocks, whichever the RDD carries. Callers must
    * only release rounds nothing will read again. */
  private[core] def releaseRdd(rdd: org.apache.spark.rdd.RDD[_]): Unit = {
    // Expected failures on this path: the session was already stopped
    // (IllegalStateException / SparkException from a dead context) — the
    // shutdown hook cleans the scratch dir then. Anything NonFatal is
    // still swallowed (release is best-effort), but fatal errors (OOM,
    // linkage) propagate instead of being hidden.
    try
      rdd.getCheckpointFile.foreach { p =>
        val path = new org.apache.hadoop.fs.Path(p)
        val fs = path.getFileSystem(rdd.context.hadoopConfiguration)
        fs.delete(path, true); ()
      }
    catch { case scala.util.control.NonFatal(_) => () }
    // fallback-path (localCheckpoint) rounds hold blocks, not files
    if (rdd.getStorageLevel != StorageLevel.NONE) {
      try rdd.unpersist(blocking = false)
      catch { case scala.util.control.NonFatal(_) => () }
    }
    ()
  }

  /** Release a SUPERSEDED round's storage once its successor is
    * materialized. */
  def drop(df: DataFrame): Unit = checkpointRdd(df).foreach(releaseRdd)
}
