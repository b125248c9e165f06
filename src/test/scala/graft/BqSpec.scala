package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.functions.{BqEncodeExpr, BqHammingDistance, BqSignCosineDistance}
import graft.ops.Similarity

class BqSpec extends SparkSpec with Matchers {

  test("bq_encode packs sign bits LSB-first with zero pad") {
    import spark.implicits._
    // 10 dims: signs + - + + - - - + | + -  →  byte0 = 0b10001101, byte1 = 0b01
    val df = Seq(Tuple1(Seq(1f, -2f, 3f, 0.5f, -0.1f, -9f, -1f, 2f, 1f, -1f)))
      .toDF("embedding")
      .select(BqEncodeExpr.col($"embedding").as("code"))
    val code = df.collect()(0).getAs[Array[Byte]](0)
    code.length shouldBe 2
    (code(0) & 0xff) shouldBe 0x8d
    (code(1) & 0xff) shouldBe 0x01
  }

  test("zero is not positive: a zero vector encodes to all-zero bits") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq(0f, 0f, 0f, 0f)))
      .toDF("embedding").select(BqEncodeExpr.col($"embedding").as("code"))
    df.collect()(0).getAs[Array[Byte]](0).toSeq shouldBe Seq(0.toByte)
  }

  test("bq_hamming equals the naive bit-difference count") {
    import spark.implicits._
    val a = Seq(1f, -1f, 1f, 1f, -1f, -1f, 1f, -1f, 1f)
    val b = Seq(1f, 1f, -1f, 1f, -1f, 1f, 1f, -1f, -1f)
    val naive = a.zip(b).count { case (x, y) => (x > 0) != (y > 0) }
    val hd = Seq((a, b)).toDF("a", "b")
      .select(BqHammingDistance.col(
        BqEncodeExpr.col($"a"), BqEncodeExpr.col($"b")).as("hd"))
      .collect()(0).getInt(0)
    hd shouldBe naive
  }

  test("sign-asymmetric distance matches the closed form") {
    import spark.implicits._
    val q = Seq(0.6f, -0.8f, 0f, 0f)
    val c = Seq(1f, -1f, 1f, -1f) // encodes to signs + - + -
    val d = Seq((q, c)).toDF("q", "c")
      .select(BqSignCosineDistance.col($"q", BqEncodeExpr.col($"c")).as("d"))
      .collect()(0).getDouble(0)
    // dot = 0.6*1 + (-0.8)*(-1) + 0 - 0 = 1.4; |q| = 1, |s| = 2
    d shouldBe (1.0 - 1.4 / 2.0) +- 1e-6
  }

  test("zero query vector yields the 1.0 sentinel, not NaN") {
    import spark.implicits._
    val d = Seq((Seq(0f, 0f, 0f, 0f), Seq(1f, -1f, 1f, -1f))).toDF("q", "c")
      .select(BqSignCosineDistance.col($"q", BqEncodeExpr.col($"c")).as("d"))
      .collect()(0).getDouble(0)
    d shouldBe 1.0
  }

  test("bqTopK recovers brute-force neighbors on separated clusters") {
    import spark.implicits._
    // clusters in distinct orthants → sign codes separate them exactly
    val vecs = ((0 until 6).map(i => (i.toLong, Seq(1f, 0.01f * (i + 1), 0.01f, 0.01f))) ++
      (6 until 12).map(i => (i.toLong, Seq(-1f, -0.01f * (i - 5), 0.01f, 0.01f))))
      .toDF("vec_id", "embedding")
    val brute = Similarity.bruteTopK(vecs.where($"vec_id" === 0), vecs, k = 3)
      .collect().map(_.getLong(1)).toSet
    val bq = Similarity.bqTopK(vecs.where($"vec_id" === 0), vecs, k = 3,
        coarseFactor = 2, fineFactor = 1)
      .collect().map(_.getLong(1)).toSet
    bq shouldBe brute
  }

  test("cascade shortlists are capped: fine stage emits at most k*fineFactor per query") {
    import spark.implicits._
    val vecs = (0 until 40).map(i =>
      (i.toLong, Seq(math.sin(i * 1.7).toFloat, math.cos(i * 2.3).toFloat,
        math.sin(i * 0.9).toFloat, math.cos(i * 1.1).toFloat)))
      .toDF("vec_id", "embedding")
    val out = Similarity.bqTopK(vecs.where($"vec_id" < 2), vecs, k = 2,
      coarseFactor = 4, fineFactor = 2)
    out.groupBy("query_id").agg(count(lit(1)).as("n"))
      .collect().foreach(_.getLong(1) should be <= 2L)
  }
}
