package graft

import org.scalatest.matchers.should.Matchers

import graft.ops.Containment

class ContainmentSpec extends SparkSpec with Matchers {

  private def mk(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    Containment.sketchDocs(rows.toDF("doc_id", "text"), "doc_id", "text", n = 2, k = 32)
  }

  test("below k the estimator is exact: subset gives containment 1, disjoint gives none") {
    val a = "alpha beta gamma delta epsilon zeta"
    val sk = mk(Seq(
      1L -> a,                                   // query
      2L -> (a + " eta theta iota kappa"),       // superset of A's shingles
      3L -> "one two three four five six seven")) // disjoint
    import spark.implicits._
    val pairs = Containment.containmentJoin(sk.where($"doc_id" === 1), sk, k = 32, threshold = 0.1)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    pairs(2L) shouldBe 1.0 +- 1e-9 // every A-shingle present in B
    pairs.get(3L) shouldBe None    // nothing shared
  }

  test("above k the estimate tracks true containment within tolerance") {
    val shared = (0 until 150).map(i => s"common$i").mkString(" ")
    val extraA = (0 until 50).map(i => s"onlya$i").mkString(" ")
    val extraB = (0 until 300).map(i => s"onlyb$i").mkString(" ")
    val sk = mk(Seq(1L -> s"$shared $extraA", 2L -> s"$shared $extraB"))
    import spark.implicits._
    val got = Containment.containmentJoin(sk.where($"doc_id" === 1), sk, k = 32, threshold = 0.0)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    // true containment ≈ 150/200 shingle-ish; wide tolerance (k = 32 sketch)
    got(2L) shouldBe 0.75 +- 0.25
  }
}
