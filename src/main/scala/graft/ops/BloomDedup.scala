package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter pre-filtered dedup insert — the 100 TB shape of the
  * reference's skip-duplicates write (duckvdb.py:56-61).
  *
  * A plain left-anti join against the full id set shuffles the ENTIRE
  * batch keyed by id. With a Bloom filter built over the existing ids
  * (one distributed aggregation, a few bits per key) the batch splits
  * map-side:
  *   - "definitely new" (filter says absent — Bloom has no false
  *     negatives): appended with NO join at all;
  *   - "maybe duplicate" (filter says present): only these — the true
  *     duplicates plus the false-positive fraction — pay the exact
  *     anti-join shuffle.
  * Result is EXACT (false positives are re-checked, false negatives
  * impossible). The filter is built with Spark's own
  * `BloomFilterAggregate` over `xxhash64(id)` — the same
  * (aggregate, probe) pair Spark's runtime row-level filtering uses —
  * and probed with the codegen'd `BloomFilterMightContain` predicate,
  * so the map-side split stays inside whole-stage codegen (no Scala
  * UDF breaking the fused stage). An id collision under xxhash64 can
  * only ADD a false positive, which the anti-join re-check absorbs.
  */
object BloomDedup {

  /** Rows of `batch` whose `idCol` does not occur in `existing`.
    * Within-batch duplicates collapse to ONE ARBITRARY row per key
    * (`dropDuplicates` gives no ordering guarantee) — callers needing
    * deterministic payloads must pass a key-unique batch, as
    * [[Incremental.upsert]] requires and the `vdb_insert_bloom` call
    * site does (it pre-aggregates). The KEY SET kept is exact and
    * deterministic either way. `expectedKeys`/`fpp` size the filter
    * bits (`BloomFilter.optimalNumOfBits`); the serialized filter ships
    * as a plan literal, reclaimed with the plan itself.
    *
    * Cost shape (verified in the plan): the batch is scanned twice
    * (once per branch of the union — map-only), in exchange for the
    * anti-join seeing only the maybe-duplicate sliver. That trade wins
    * exactly when `existing` is too big to broadcast: the plain
    * anti-join would sort-merge-shuffle BOTH sides, the bloomed one
    * shuffles only |dups| + fpp·|new| batch rows against it. */
  def insertDedup(batch: DataFrame, existing: DataFrame, idCol: String,
      expectedKeys: Long = 1000000L, fpp: Double = 0.03): DataFrame = {
    val hashed = GraftBridge.expression(xxhash64(col(idCol)))
    val buildFilter = new BloomFilterAggregate(hashed,
      Literal(expectedKeys), Literal(BloomFilter.optimalNumOfBits(expectedKeys, fpp)))
      .toAggregateExpression()
    val bytes = existing.select(GraftBridge.column(buildFilter)).head.getAs[Array[Byte]](0)
    val fresh = batch.dropDuplicates(idCol)
    if (bytes == null) fresh // existing had no rows: the whole batch is new
    else {
      val mightContain = GraftBridge.column(
        BloomFilterMightContain(Literal(bytes, BinaryType), hashed))
      val definitelyNew = fresh.where(!mightContain)
      val maybeDup = fresh.where(mightContain)
        .join(existing.select(col(idCol)), Seq(idCol), "left_anti")
      definitelyNew.unionByName(maybeDup)
    }
  }
}
