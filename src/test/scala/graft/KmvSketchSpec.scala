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

  test("sketch algebra: pairwise union/intersection estimates land within tolerance of exact") {
    // the oracle pins both engines to the SAME estimates; this pins the
    // estimates to the TRUTH (k=64 → σ ≈ 1/√63 ≈ 12.6%; 35% is ~2.8σ
    // plus inclusion-exclusion error stacking for the intersection)
    val out = SparkEntry.queries("agg_sketch_algebra")(spark, "/root/testdata/sf0.001")
      .collect()
    graft.core.PlanCache.release(spark)
    out.length shouldBe 6
    for (r <- out) {
      val (estU, estI) = (r.getDouble(2), r.getDouble(3))
      val (exU, exI) = (r.getLong(4), r.getLong(5))
      withClue(s"pair ${r.getString(0)}-${r.getString(1)} union $estU vs $exU: ") {
        math.abs(estU - exU) / exU.toDouble should be < 0.35
      }
      withClue(s"pair ${r.getString(0)}-${r.getString(1)} intersect $estI vs $exI: ") {
        math.abs(estI - exI) / exU.toDouble should be < 0.35
      }
    }
  }
}
