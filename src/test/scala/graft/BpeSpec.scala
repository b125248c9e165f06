package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.ops.Bpe

class BpeSpec extends SparkSpec with Matchers {

  test("greedy merges converge a two-word vocab and extra rounds are no-ops") {
    import spark.implicits._
    // "aaab"×2, "ab"×1 → merges: (a,a) → (a,b) → (aa,ab); round 4 has
    // no pairs left and must leave the state untouched (not wipe it)
    val docs = Seq((1L, "aaab ab"), (2L, "aaab")).toDF("doc_id", "text")
    val out = Bpe.tokenCensus(docs, col("text"), rounds = 4, topN = 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    graft.core.PlanCache.release(spark)
    out.toSeq shouldBe Seq((1, "aaab", 2L), (2, "ab", 1L))
  }

  test("merge order is frequency-greedy with lexicographic tie-break") {
    import spark.implicits._
    // pairs (x,y) and (y,z) both appear twice → tie breaks to (x,y)
    val docs = Seq((1L, "xyz xyz")).toDF("doc_id", "text")
    val vocab = Bpe.tokenizedVocab(docs, col("text"), rounds = 1)
      .collect().map(_.getString(1))
    graft.core.PlanCache.release(spark)
    vocab.toSeq shouldBe Seq(" xy z ")
  }

  test("alternating runs merge fully through the nested replace") {
    import spark.implicits._
    // "ababab": after merge (a,b) every alternation must collapse —
    // one replace pass alone would leave unmerged residue
    val docs = Seq((1L, "ababab ab")).toDF("doc_id", "text")
    val vocab = Bpe.tokenizedVocab(docs, col("text"), rounds = 1)
      .collect().map(_.getString(1)).sorted
    graft.core.PlanCache.release(spark)
    vocab.toSeq shouldBe Seq(" ab ", " ab ab ab ")
  }
}
