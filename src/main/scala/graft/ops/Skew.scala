package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on in
  * the harness sessions) re-plans oversized sort-merge partitions at
  * runtime and is the first line of defense. Salting is for the case
  * AQE can't fix: a single hot key whose matching build side is too big
  * to broadcast — one reducer still gets the whole key. Salting splits
  * that key across `salts` reducers at the cost of replicating the
  * small side `salts`×.
  *
  * Deterministic by construction: the big side's salt comes from
  * hashing a per-row column (not `rand()`), so the operator is
  * reproducible and oracle-checkable — the result equals the unsalted
  * join exactly.
  */
object Skew {

  /** Inner equi-join of `big` (skewed on `key`) against `small`, with
    * the hot keys spread over `salts` buckets. `saltSrc` must be a
    * column of `big` with per-row variation (e.g. its primary key). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
      saltSrc: Column): DataFrame = {
    require(salts > 0, "salts must be positive")
    val b = big.withColumn("__salt", pmod(hash(saltSrc), lit(salts)))
    val s = small.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i)): _*)))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase aggregation for high-cardinality-per-key skew where a
    * non-algebraic aggregate (here: exact distinct count) would
    * concentrate one key's rows on one reducer. Phase 1 aggregates
    * (key, salt); phase 2 merges the partials per key. For algebraic
    * aggregates Spark's map-side partial aggregation already does
    * this — use it only when partials can't combine locally. */
  def saltedDistinctCount(df: DataFrame, key: String, valueCol: String,
      salts: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(col(valueCol)), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(countDistinct(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum("__partial").as("distinct_count"))
}
