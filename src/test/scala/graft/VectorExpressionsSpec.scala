package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.functions.VectorFunctions

class VectorExpressionsSpec extends SparkSpec with Matchers {
  import VectorFunctions._

  private def dist(a: Seq[Float], b: Seq[Float]): Double = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b")
      .select(cosineDistance(col("a"), col("b")).as("d"))
      .head().getDouble(0)
  }

  test("cosine distance basic values") {
    dist(Seq(1f, 0f), Seq(1f, 0f)) shouldBe 0.0 +- 1e-12
    dist(Seq(1f, 0f), Seq(0f, 1f)) shouldBe 1.0 +- 1e-12
    dist(Seq(1f, 0f), Seq(-1f, 0f)) shouldBe 2.0 +- 1e-12
    // hand-computed: 1 - 8/(sqrt(5)*sqrt(13))
    dist(Seq(1f, 2f), Seq(2f, 3f)) shouldBe (1.0 - 8.0 / (math.sqrt(5) * math.sqrt(13))) +- 1e-12
  }

  test("zero vector convention: distance 1") {
    dist(Seq(0f, 0f), Seq(1f, 2f)) shouldBe 1.0 +- 1e-12
  }

  test("dimension mismatch throws (reference cast-failure semantics)") {
    val e = intercept[Exception](dist(Seq(1f, 2f), Seq(1f, 2f, 3f)))
    e.getMessage should include("dimension mismatch")
  }

  test("dot product") {
    import spark.implicits._
    val d = Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))).toDF("a", "b")
      .select(dotProduct(col("a"), col("b")).as("d")).head().getDouble(0)
    d shouldBe 32.0 +- 1e-12
  }

  test("codegen and interpreted eval agree bit-exactly") {
    import spark.implicits._
    val df = Seq((Seq(0.1f, -0.2f, 0.37f, 1.5f), Seq(0.9f, 0.11f, -2.0f, 0.004f))).toDF("a", "b")
    val viaCodegen = df.select(cosineDistance(col("a"), col("b"))).head().getDouble(0)
    // filter forces interpreted eval path in constraint propagation-free context
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val viaInterp = try df.select(cosineDistance(col("a"), col("b"))).head().getDouble(0)
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(java.lang.Double.doubleToLongBits(viaCodegen) === java.lang.Double.doubleToLongBits(viaInterp))
  }

  test("SQL registration works") {
    VectorFunctions.register(spark)
    val d = spark.sql("SELECT cosine_distance(array(1.0f, 0.0f), array(0.0f, 1.0f)) AS d")
      .head().getDouble(0)
    d shouldBe 1.0 +- 1e-12
  }
}
