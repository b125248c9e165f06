package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.functions.{KmvSketch, TextKernels}

class KmvSketchSpec extends SparkSpec with Matchers {

  test("sketch is the k smallest distinct hashes, invariant to partitioning") {
    import spark.implicits._
    val hashes = (0 until 2000).map(i => TextKernels.hexLong(s"item-$i"))
    val expected = hashes.distinct.sorted.take(16)
    Seq(1, 4, 13).foreach { parts =>
      val got = hashes.toDF("h").repartition(parts)
        .agg(KmvSketch.sketch($"h", 16).as("sketch"))
        .head.getSeq[Long](0)
      got shouldBe expected
    }
  }

  test("distinct-count estimate within 15% at k=64; exact below k") {
    import spark.implicits._
    val n = 5000
    val sk = (0 until n).map(i => TextKernels.hexLong(s"v$i")).toDF("h")
      .agg(KmvSketch.sketch($"h", 64).as("s")).head.getSeq[Long](0)
    val est = KmvSketch.estimate(sk, 64)
    est shouldBe n.toDouble +- n * 0.15
    val small = (0 until 10).map(i => TextKernels.hexLong(s"v$i")).toDF("h")
      .agg(KmvSketch.sketch($"h", 64).as("s")).head.getSeq[Long](0)
    KmvSketch.estimate(small, 64) shouldBe 10.0
  }
}
