package graft

import org.scalatest.matchers.should.Matchers

import graft.table.Bucketing

class BucketingSpec extends SparkSpec with Matchers {

  test("bucketed-by-key tables join without any shuffle exchange") {
    import spark.implicits._
    val a = spark.range(1000).select(($"id" % 100).as("k"), $"id".as("va"))
    val b = spark.range(500).select(($"id" % 100).as("k"), ($"id" * 2).as("vb"))
    Bucketing.writeBucketed(a, "bk_a", nBuckets = 4, Seq("k"))
    Bucketing.writeBucketed(b, "bk_b", nBuckets = 4, Seq("k"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val bucketed = spark.table("bk_a").join(spark.table("bk_b"), Seq("k"))
      val rows = bucketed.count()
      // same result as the plain (shuffling) join
      rows shouldBe a.join(b, Seq("k")).count()
      // and the bucketed plan moved no data to get it
      Bucketing.shuffleFree(bucketed) shouldBe true
      val unbucketed = a.join(b, Seq("k"))
      unbucketed.count()
      Bucketing.shuffleFree(unbucketed) shouldBe false
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bk_a")
      spark.sql("DROP TABLE IF EXISTS bk_b")
    }
  }

  test("groupBy on the bucket key aggregates without a shuffle") {
    import spark.implicits._
    val a = spark.range(1000).select(($"id" % 50).as("k"), $"id".as("v"))
    Bucketing.writeBucketed(a, "bk_g", nBuckets = 4, Seq("k"))
    try {
      val agg = spark.table("bk_g").groupBy("k").sum("v")
      agg.count() shouldBe 50
      Bucketing.shuffleFree(agg) shouldBe true
    } finally spark.sql("DROP TABLE IF EXISTS bk_g")
  }
}
