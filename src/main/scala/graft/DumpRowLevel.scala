package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: runs named registry entries with
  * `spark.graft.plandump.dir` set, so the row-level command machinery
  * (MERGE/UPDATE/upsert — whose joins never appear in the entry's
  * returned plan) writes its internal `explain("formatted")` dumps per
  * entry under `<outDir>/<entry>/`. Evidence source for
  * plans/r13/<entry>_{before,after}.txt. */
object DumpRowLevel {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val names = args.drop(1).toSeq
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
    for (name <- names if SparkEntry.queries.contains(name)) {
      spark.conf.set("spark.graft.plandump.dir", s"$outDir/$name")
      try {
        SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
        println(s"DUMP ok $name")
      } catch {
        case e: Throwable => System.err.println(s"DUMP $name FAILED: ${e.getMessage}")
      } finally spark.conf.unset("spark.graft.plandump.dir")
    }
    SparkEntry.releaseSessionCaches(spark)
    spark.stop()
  }
}
