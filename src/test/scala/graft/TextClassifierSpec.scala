package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.ops.TextClassifier

class TextClassifierSpec extends SparkSpec with Matchers {

  // two classes with disjoint vocabularies — linearly separable
  private lazy val docs = {
    import spark.implicits._
    (0 until 40).map { i =>
      if (i % 2 == 0) (i.toLong, s"alpha beta gamma delta w$i", "a")
      else (i.toLong, s"omega sigma tau upsilon w$i", "b")
    }.toDF("doc_id", "text", "cls")
  }

  test("classifier separates disjoint-vocabulary classes; gate honors the floor") {
    val gate = TextClassifier.classifierGate(docs, "text", "cls",
      isTest = col("doc_id") % 5 === 0, classes = Seq("a", "b"), floor = 0.9)
      .head()
    gate.getLong(0) shouldBe 32L // 80/20 deterministic split
    gate.getLong(1) shouldBe 8L
    gate.getInt(2) shouldBe 1    // separable → perfect held-out accuracy
    // an unsatisfiable floor flips the gate, not the counts
    val strict = TextClassifier.classifierGate(docs, "text", "cls",
      isTest = col("doc_id") % 5 === 0, classes = Seq("a", "b"), floor = 1.01)
      .head()
    strict.getInt(2) shouldBe 0
  }

  test("labels outside `classes` map to the extra bucket, not a crash") {
    import spark.implicits._
    val withNoise = docs.unionAll(
      Seq((101L, "alpha beta zeta", "weird")).toDF("doc_id", "text", "cls"))
    val gate = TextClassifier.classifierGate(withNoise, "text", "cls",
      isTest = col("doc_id") % 5 === 0, classes = Seq("a", "b"), floor = 0.8)
      .head()
    gate.getLong(0) shouldBe 33L // the out-of-class row lands in training
    gate.getInt(2) shouldBe 1
  }
}
