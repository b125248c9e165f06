package graft
import org.apache.spark.sql.SparkSession

/** Per-query timing/explain harness: `runMain graft.DbgMain <query...>`
  * runs each named SparkEntry query 3× against SPARK_GRAFT_SF_DIR
  * (default sf0.1) and prints the formatted plan of the first —
  * the quick loop for adjudicating bench anomalies against plans. */
object DbgMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    val names = if (args.nonEmpty) args.toSeq else Seq("agg_approx_distinct")
    for (r <- 1 to 3; n <- names) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
      println(f"[dbg] $n run$r ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    SparkEntry.queries(names.head)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
