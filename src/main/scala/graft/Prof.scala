package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-entry job profiler — the measurement tool behind the r12
  * optimization round (guide §1: measure first; §7.1: the UI's
  * jobs/stages view, reproduced headless). For each named registry
  * entry it runs one UNMEASURED pass (warms JVM codegen and the
  * session fixture memos, matching the bench's min-of-passes steady
  * state) and then one measured pass with a listener capturing every
  * job's wall time and the call site of its trigger, printing a
  * per-job breakdown. A 5 s entry that is 25 × 0.2 s jobs is a
  * job-count problem (checkpoint cuts, per-query collect loops); one
  * 4 s job is a plan problem — the two need different fixes and this
  * tells them apart in one run.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id * 2)").collect()

    case class Job(id: Int, started: Long, site: String, var ended: Long = 0L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Job]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val site = e.stageInfos.lastOption.map(_.name).getOrElse("?")
        val j = Job(e.jobId, System.nanoTime(), site)
        jobs.put(e.jobId, j); order.add(j); ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach(_.ended = System.nanoTime()); ()
      }
    }

    val names =
      if (args.nonEmpty) args.toSeq.filter(SparkEntry.queries.contains)
      else Seq("graph_hits")
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      // pass 1: unmeasured (fixture memos, codegen) — same steady state
      // the bench's min-of-passes reports
      fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
      jobs.clear(); order.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
      val total = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      println(f"PROF $name total=$total%.3f s jobs=${order.size}")
      val it = order.iterator()
      var acc = 0.0
      while (it.hasNext) {
        val j = it.next()
        val d = if (j.ended > 0) (j.ended - j.started) / 1e9 else -1.0
        acc += math.max(d, 0)
        println(f"PROF   job=${j.id}%4d ${d}%8.3f s  ${j.site.take(110)}")
      }
      println(f"PROF $name sum_jobs=$acc%.3f s (gap=${total - acc}%.3f s driver/planning)")
    }
    SparkEntry.releaseSessionCaches(spark)
    spark.stop()
  }
}
