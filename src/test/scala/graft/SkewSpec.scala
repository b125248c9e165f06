package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.ops.Skew

class SkewSpec extends SparkSpec with Matchers {

  test("salted join equals unsalted join on skewed data") {
    import spark.implicits._
    // 10k rows of one hot key + a tail of 100 normal keys
    val big = spark.range(10000).select(
      when($"id" < 9000, lit("HOT")).otherwise(concat(lit("k"), $"id" % 100)).as("k"),
      $"id".as("row_id"))
    val small = spark.range(100).select(
      when($"id" === 0, lit("HOT")).otherwise(concat(lit("k"), $"id")).as("k"),
      ($"id" * 10).as("payload"))
    val plain = big.join(small, Seq("k")).select("k", "row_id", "payload")
      .collect().map(_.toString).sorted
    val salted = Skew.saltedJoin(big, small, "k", salts = 8, saltSrc = $"row_id")
      .select("k", "row_id", "payload")
      .collect().map(_.toString).sorted
    salted shouldBe plain
  }

  test("salted two-phase distinct count equals plain countDistinct") {
    import spark.implicits._
    val df = spark.range(5000).select(
      when($"id" < 4500, lit("HOT")).otherwise(lit("COLD")).as("k"),
      ($"id" % 700).as("v"))
    val plain = df.groupBy("k").agg(countDistinct($"v").as("distinct_count"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val salted = Skew.saltedDistinctCount(df, "k", "v", salts = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    salted shouldBe plain
  }
}
