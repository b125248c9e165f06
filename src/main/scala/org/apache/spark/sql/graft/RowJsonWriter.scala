package org.apache.spark.sql.graft

import java.io.Writer

import org.apache.hadoop.conf.Configuration

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.json.{JacksonGenerator, JSONOptions}
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** Internal-API bridging for the gvdb V2 streaming write, isolated in
  * this package so the `private[sql]`/`private[spark]` scopes are
  * satisfied (the same technique as `graftbridge.GraftBridge`).
  *
  * [[RowJsonWriter]] serializes `InternalRow`s as JSON lines through
  * Spark's OWN [[JacksonGenerator]] — the exact writer behind
  * `df.write.json` — so staged rows round-trip bit-exactly through
  * `spark.read.schema(schema).json(...)` for every Spark type
  * (floats/doubles print shortest-round-trip decimals, strings escape
  * per JSON, arrays/structs nest), with no hand-rolled serializer to
  * drift from the engine's.
  */
class RowJsonWriter(schema: StructType, out: Writer) {
  private val gen = new JacksonGenerator(schema, out,
    new JSONOptions(Map.empty[String, String], "UTC"))
  def write(row: InternalRow): Unit = { gen.write(row); gen.writeLineEnding() }
  def close(): Unit = gen.close()
}

/** Serializable Hadoop-configuration carrier for task-side FileSystem
  * access (Spark's own `SerializableConfiguration` is
  * `private[spark]`, so connector code outside the package needs this
  * public wrapper). */
class ConfBox(@transient conf: Configuration) extends Serializable {
  private val ser = new SerializableConfiguration(conf)
  def value: Configuration = ser.value
}
