package graft

import org.scalatest.matchers.should.Matchers

import graft.ops.{NaiveBayes, Pca}

class PcaNbSpec extends SparkSpec with Matchers {

  test("covariance matches the closed form on a tiny 2-d set") {
    import spark.implicits._
    // points (0,0), (2,0), (0,2), (2,2): mu=(1,1), C = [[1,0],[0,1]]
    val df = Seq(
      (1L, Array(0.0f, 0.0f)), (2L, Array(2.0f, 0.0f)),
      (3L, Array(0.0f, 2.0f)), (4L, Array(2.0f, 2.0f))).toDF("id", "v")
    val (n, mu, c) = Pca.covariance(df, "v", dim = 2)
    n shouldBe 4L
    mu.toSeq shouldBe Seq(1.0, 1.0)
    c(0)(0) shouldBe 1.0; c(1)(1) shouldBe 1.0
    c(0)(1) shouldBe 0.0; c(1)(0) shouldBe 0.0
  }

  test("power iteration recovers the dominant eigenvector and eigenvalue") {
    // C = [[3,1],[1,3]]: eigenvalues 4 and 2, dominant vector (1,1)/√2
    val c = Array(Array(3.0, 1.0), Array(1.0, 3.0))
    val v = Pca.powerIterate(c, iters = 20)
    math.abs(v(0)) shouldBe (1.0 / math.sqrt(2.0)) +- 1e-6
    math.abs(v(1)) shouldBe (1.0 / math.sqrt(2.0)) +- 1e-6
    // Rayleigh quotient ≈ 4
    val w0 = c(0)(0) * v(0) + c(0)(1) * v(1)
    val w1 = c(1)(0) * v(0) + c(1)(1) * v(1)
    (v(0) * w0 + v(1) * w1) shouldBe 4.0 +- 1e-6
  }

  test("leadingComponent finds the stretched axis of an anisotropic cloud") {
    import spark.implicits._
    // variance concentrated on dim 1 (values ±5), noise on dim 0 (±1)
    val pts = (0 until 40).map { i =>
      val sign = if (i % 2 == 0) 1.0f else -1.0f
      val noise = if (i % 4 < 2) 0.1f else -0.1f
      (i.toLong, Array(noise, 5.0f * sign, 0.0f, 0.0f))
    }
    val df = pts.toDF("id", "v")
    val out = Pca.leadingComponent(df, "v", dim = 4, iters = 8).head()
    out.getInt(2) shouldBe 1 // top_dim = the stretched axis
    out.getDouble(0) shouldBe 25.0 +- 0.1 // lambda ≈ var(dim1) = 25
    out.getDouble(1) should be > 0.95 // explains nearly everything
  }

  test("naive bayes separates two vocabularies and reports the confusion census") {
    import spark.implicits._
    // ids ≡ 0 (mod 5) are held out; each class has a disjoint vocabulary
    val docs = Seq(
      (1L, "aa bb aa", "x"), (2L, "aa aa", "x"), (6L, "bb aa", "x"),
      (3L, "cc dd cc", "y"), (4L, "dd dd", "y"), (7L, "cc dd", "y"),
      (5L, "aa bb aa bb", "x"), // test, x vocabulary
      (10L, "cc cc dd", "y")) // test, y vocabulary
      .toDF("doc_id", "text", "lang")
    val out = NaiveBayes.confusion(docs, "doc_id", "text", "lang")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    out(("x", "x")) shouldBe 1L
    out(("y", "y")) shouldBe 1L
    out.size shouldBe 2 // no misclassifications
  }

  test("naive bayes smoothing keeps unseen test tokens finite (no class wipeout)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aa aa"), (2L, "bb bb"),
      (5L, "aa zz")) // 5 is held out and carries an OOV token
      .map { case (id, t) => (id, t, if (id == 2L) "y" else "x") }
      .toDF("doc_id", "text", "lang")
    val out = NaiveBayes.confusion(docs, "doc_id", "text", "lang").collect()
    out should have length 1
    out.head.getString(1) shouldBe "x" // the seen token dominates, OOV is smoothed
  }
}
