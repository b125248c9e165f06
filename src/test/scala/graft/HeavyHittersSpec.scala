package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.functions.{BitmapDistinct, HeavyHitters}

class HeavyHittersSpec extends SparkSpec with Matchers {

  private def zipfStream: Seq[String] =
    // item i appears 1000/i times — clear heavy head, long-ish tail
    (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"item$i"))

  test("capacity >= distinct items: sketch is exact, invariant to partitioning") {
    import spark.implicits._
    val data = zipfStream
    val exact = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    Seq(1, 4, 7).foreach { parts =>
      val mg = data.toDF("w").repartition(parts)
        .agg(HeavyHitters.sketch($"w", 64).as("mg"))
        .head.getMap[String, Long](0)
      mg.toMap shouldBe exact
    }
  }

  test("small capacity: every estimate undercounts by at most N/(capacity+1), heavy items survive") {
    import spark.implicits._
    val data = zipfStream
    val n = data.size
    val exact = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cap = 8
    val bound = n.toDouble / (cap + 1)
    Seq(1, 4).foreach { parts =>
      val mg = data.toDF("w").repartition(parts)
        .agg(HeavyHitters.sketch($"w", cap).as("mg"))
        .head.getMap[String, Long](0).toMap
      mg.size should be <= cap
      mg.foreach { case (k, est) =>
        est should be <= exact(k)
        (exact(k) - est).toDouble should be <= bound
      }
      // every item with true count > N/(cap+1) must be present
      exact.filter(_._2 > bound).keys.foreach { k => mg.keySet should contain(k) }
    }
  }

  test("bitmap distinct matches countDistinct per group under any partitioning") {
    import spark.implicits._
    val rows = (0 until 5000).map(i => ((i * 7919) % 4000).toLong -> s"g${i % 3}")
    val df = rows.toDF("k", "g")
    val exact = df.groupBy($"g").agg(countDistinct($"k").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq(1, 4, 9).foreach { parts =>
      val got = df.repartition(parts).groupBy($"g")
        .agg(BitmapDistinct.distinct($"k", 1L << 13).as("d"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      got shouldBe exact
    }
  }

  test("bitmap distinct rejects keys outside the declared dense range") {
    import spark.implicits._
    val err = intercept[Exception] {
      Seq(5L, 1L << 21).toDF("k").agg(BitmapDistinct.distinct($"k", 1L << 20)).collect()
    }
    err.getMessage should include("outside dense range")
  }

  test("count-min estimates never under-count and are exact absent collisions") {
    import spark.implicits._
    // skewed corpus: "hot" 300×, "warm" 40×, "cold" 1×
    val docs = (Seq.fill(300)("hot") ++ Seq.fill(40)("warm") ++ Seq("cold"))
      .grouped(10).map(_.mkString(" ")).toSeq.toDF("text")
    val sk = graft.ops.CountMin.sketch(docs, "text", d = 4, w = 256)
    sk.agg(sum($"c")).head().getLong(0) shouldBe 341L * 4 // mass conserved per row
    val est = graft.ops.CountMin
      .estimates(sk, Seq("hot", "warm", "cold", "never"), d = 4, w = 256)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // deterministic md5 hashes: 3 tokens in 4×256 counters don't
    // collide, so the one-sided estimates are exact and absent = 0
    est("hot") shouldBe 300L
    est("warm") shouldBe 40L
    est("cold") shouldBe 1L
    est("never") shouldBe 0L
  }
}
