package graft

import org.scalatest.matchers.should.Matchers

import graft.ops.Dedup

/** Guards on the embedding near-dup API: the no-block path must never
  * silently plan an all-pairs cross product (VERDICT r1 hazard). */
class DedupGuardSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("no blockCol and no lshDim is rejected") {
    val e = intercept[IllegalArgumentException] {
      Dedup.embeddingNearDups(emb, "vec_id", "embedding", 0.7, blockCol = None)
    }
    e.getMessage should include("cross")
  }

  test("no-block path LSH-buckets instead of cross-joining") {
    val pairs = Dedup.embeddingNearDups(emb, "vec_id", "embedding", 0.7,
      blockCol = None, lshDim = 64)
    val physical = pairs.queryExecution.executedPlan.toString
    physical should not include "CartesianProduct"
    physical should not include "BroadcastNestedLoopJoin"
    // join keyed on (table, bucket) — a real equi-join (strategy varies
    // with stats: SMJ / broadcast-hash / shuffled-hash are all fine)
    physical should (include("SortMergeJoin") or include("BroadcastHashJoin")
      or include("ShuffledHashJoin"))
    // finds real near-dup pairs (subset check vs the blocked exact path
    // restricted to pairs LSH can see is tautological; just prove it
    // returns plausible pairs below the threshold)
    val rows = pairs.collect()
    all(rows.map(_.getDouble(2))) should be <= 0.7
  }
}
