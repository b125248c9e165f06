package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-fixture table loaders (TESTDATA.md). */
object Tables {
  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))

  /** Normalize a parquet-read timestamp column to session-zoned
    * `TimestampType`, whatever the file stored:
    *  - TIMESTAMP(NANOS) read as epoch-nanos long under
    *    `spark.sql.legacy.parquet.nanosAsLong=true` — integral `div`,
    *    not `/`: long `/` promotes to Double and epoch-nanos (~1.8e18)
    *    exceed a double's 53-bit mantissa, truncating ~10% of values
    *    ±1 µs vs DuckDB's exact `epoch_us`;
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) read as
    *    TIMESTAMP_NTZ — cast reinterprets the local time in the session
    *    timezone (UTC here), matching DuckDB's naive-timestamp
    *    `epoch_us` exactly;
    *  - already-TimestampType passes through. */
  def normalizeTs(df: DataFrame, colName: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema(colName).dataType match {
      case LongType =>
        df.withColumn(colName, timestamp_micros(expr(s"$colName div 1000")))
      case TimestampNTZType =>
        df.withColumn(colName, col(colName).cast(TimestampType))
      case _ => df
    }
  }

  /** `events.parquet` with `ts` normalized to TimestampType (see
    * [[normalizeTs]] for the storage encodings handled). */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(load(spark, dir, "events"), "ts")
}
