package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-fixture table loaders (TESTDATA.md). */
object Tables {
  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))

  /** `events.parquet` stores TIMESTAMP(NANOS), which Spark reads as epoch
    * nanos (long) under `spark.sql.legacy.parquet.nanosAsLong=true`.
    * Reconstructs `ts` as a proper timestamp (microsecond truncation). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
    else raw
  }
}
