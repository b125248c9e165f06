package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  * impossible); the shuffle shrinks from |batch| to
  * |dups| + fpp·|new|. The filter itself is built with Spark's
  * distributed BloomFilter aggregate and broadcast via closure.
  */
object BloomDedup {

  /** Rows of `batch` whose `idCol` does not occur in `existing`.
    * Within-batch duplicates collapse to ONE ARBITRARY row per key
    * (`dropDuplicates` gives no ordering guarantee) — callers needing
    * deterministic payloads must pass a key-unique batch, as
    * [[Incremental.upsert]] requires and the `vdb_insert_bloom` call
    * site does (it pre-aggregates). The KEY SET kept is exact and
    * deterministic either way. `expectedKeys`/`fpp` size the filter;
    * the broadcast filter is reclaimed by Spark's ContextCleaner once
    * the returned plan is unreachable (no explicit destroy hook exists
    * on a lazily-consumed plan).
    *
    * Cost shape (verified in the plan): the batch is scanned twice
    * (once per branch of the union — map-only), in exchange for the
    * anti-join seeing only the maybe-duplicate sliver. That trade wins
    * exactly when `existing` is too big to broadcast: the plain
    * anti-join would sort-merge-shuffle BOTH sides, the bloomed one
    * shuffles only |dups| + fpp·|new| batch rows against it. */
  def insertDedup(batch: DataFrame, existing: DataFrame, idCol: String,
      expectedKeys: Long = 1000000L, fpp: Double = 0.03): DataFrame = {
    val bloom = existing.stat.bloomFilter(idCol, expectedKeys, fpp)
    val bc = batch.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((id: String) => bc.value.mightContainString(id))
    val fresh = batch.dropDuplicates(idCol)
    val definitelyNew = fresh.where(!mightContain(col(idCol)))
    val maybeDup = fresh.where(mightContain(col(idCol)))
      .join(existing.select(col(idCol)), Seq(idCol), "left_anti")
    definitelyNew.unionByName(maybeDup)
  }
}
