package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.ops.Sharding

class ShardingSpec extends SparkSpec with Matchers {

  test("globalRowNumber equals the single-partition row_number, any partition count") {
    import spark.implicits._
    val df = spark.range(3000).select((col("id") * 131 % 5000).as("k"))
      .distinct() // unique order key
    val expected = df.withColumn("rn",
      (row_number().over(Window.orderBy($"k")) - 1).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq(1, 4, 11).foreach { parts =>
      val got = Sharding.globalRowNumber(df, "k", numPartitions = parts)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got shouldBe expected
    }
  }

  test("prefixSums equals the single-partition window scan, any partition count") {
    import spark.implicits._
    val df = spark.range(2000).select((col("id") * 7 % 5000).as("v")).distinct()
      .withColumn("a", col("v") % 13)
      .withColumn("b", lit(1L))
    val w = Window.orderBy($"v")
    val expected = df
      .withColumn("cum_a", sum($"a").over(w))
      .withColumn("cum_b", sum($"b").over(w))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    Seq(1, 4, 11).foreach { parts =>
      val got = Sharding.prefixSums(df, "v", Seq("a", "b"), numPartitions = parts)
        .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
      got shouldBe expected
    }
  }

  test("prefixSums on an empty frame returns an empty frame with the cum columns") {
    import spark.implicits._
    val df = spark.range(0).select(col("id").as("v"), col("id").as("a"))
    val out = Sharding.prefixSums(df, "v", Seq("a"))
    out.columns.toSeq shouldBe Seq("v", "a", "cum_a")
    out.count() shouldBe 0L
  }

  test("upsert: batch wins by KEY — a legitimate NULL in the batch does not leak old data") {
    import spark.implicits._
    val table = Seq((1L, Option("old1"), 10), (2L, Option("old2"), 20)).toDF("k", "v", "n")
    val batch = Seq((2L, None: Option[String], 99), (3L, Option("new3"), 30)).toDF("k", "v", "n")
    val got = graft.ops.Incremental.upsert(table, batch, "k")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getInt(2))).toSet
    got shouldBe Set((1L, Some("old1"), 10), (2L, None, 99), (3L, Some("new3"), 30))
  }

  test("connected components: chain, clique and isolated node all labeled by min id") {
    import spark.implicits._
    // chain 1-2-3-4-5 (diameter 4 → needs several propagation rounds),
    // clique {10,11,12}, isolated 99
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("id_a", "id_b")
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L, 12L, 99L).toDF("id")
    val got = graft.ops.Components.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 99L -> 99L)
  }

  test("bloom dedup equals the plain anti-join even with a saturated (high-fp) filter") {
    import spark.implicits._
    val existing = spark.range(500).select(concat(lit("k"), col("id")).as("id"))
    val batch = spark.range(300, 900).select(concat(lit("k"), col("id")).as("id"), col("id").as("v"))
    val expected = batch.join(existing, Seq("id"), "left_anti")
      .collect().map(_.getString(0)).sorted
    // tiny filter → most lookups are false positives → exactness must
    // come from the re-check join, not filter luck
    val got = graft.ops.BloomDedup.insertDedup(batch, existing, "id",
        expectedKeys = 10L, fpp = 0.5)
      .collect().map(_.getString(0)).sorted
    got shouldBe expected
  }

  test("bloom dedup with an EMPTY existing table keeps the whole deduped batch") {
    import spark.implicits._
    // BloomFilterAggregate over zero rows yields null: the no-filter
    // fast path must return the batch (key-deduped), not throw or drop
    val existing = spark.range(0).select(concat(lit("k"), col("id")).as("id"))
    val batch = spark.range(100).select(concat(lit("k"), col("id") % 50).as("id"))
    val got = graft.ops.BloomDedup.insertDedup(batch, existing, "id")
      .collect().map(_.getString(0)).sorted
    got shouldBe (0 until 50).map(i => s"k$i").sorted
  }

  test("numbering survives a downstream coalesce(1) (regression: TaskContext pid collapse)") {
    import spark.implicits._
    val df = spark.range(1000).select(col("id").as("k"))
    val rows = Sharding.globalRowNumber(df, "k", numPartitions = 8)
      .coalesce(1) // the Verify write path that exposed the bug
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    rows.map(_._2).sorted shouldBe (0L until 1000L)
    rows.foreach { case (k, rn) => rn shouldBe k }
  }
}
