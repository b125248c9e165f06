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
    * Reconstructs `ts` as a proper timestamp (microsecond truncation).
    * Must use integral `div` — `/` on longs promotes to Double, and
    * epoch-nanos (~1.8e18) exceed a double's 53-bit mantissa, truncating
    * ~10% of values ±1 µs vs DuckDB's exact `epoch_us`. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
}
