package graft.core

import org.apache.spark.sql.types._

/** Core data model of the vector-table engine.
  *
  * Mirrors the reference's single `items` table —
  * `CREATE TABLE items (id UUID PRIMARY KEY, metadata JSON, embedding FLOAT[dim])`
  * (reference duckvdb.py:32) — mapped to Spark types per SURVEY.md §1.2:
  * UUID → canonical 36-char string, JSON → raw JSON text string,
  * FLOAT[dim] → ArrayType(FloatType) with dim validated on write
  * (Spark has no fixed-length array type).
  */
case class VectorRecord(id: String, metadata: String, embedding: Array[Float])

/** Query output row (reference duckvdb.py:9-13 `Result` dataclass).
  * `metadata` stays raw JSON text; callers apply `from_json` if they
  * want structure (reference parses it client-side, duckvdb.py:120). */
case class Result(id: String, metadata: String, distance: Double)

object VectorSchema {
  /** The fixed outer schema of every vector table (SURVEY.md §1.3). */
  val schema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("metadata", StringType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false)
  ))

  val ID = "id"
  val METADATA = "metadata"
  val EMBEDDING = "embedding"

  /** Persisted ANN index column (sign-random-projection bucket ids per
    * hash table), present only after `VectorTable.buildAnnIndex`. */
  val ANN_BUCKETS = "__ann_buckets"

  val annSchema: StructType =
    schema.add(StructField(ANN_BUCKETS, ArrayType(LongType, containsNull = false), nullable = false))
}
