package graft

import org.scalatest.matchers.should.Matchers

import graft.ops.RangeJoin

class RangeJoinSpec extends SparkSpec with Matchers {

  test("bucketized range join equals the naive non-equi join") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val points = (0 until 500).map(i => (i.toLong, rnd.nextInt(10000).toLong)).toDF("pid", "v")
    val intervals = (0 until 50).map { i =>
      val lo = rnd.nextInt(9000).toLong
      (i.toLong, lo, lo + rnd.nextInt(2000).toLong)
    }.toDF("iid", "lo", "hi")
    val naive = points.join(intervals, $"v" >= $"lo" && $"v" <= $"hi")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Seq(100L, 1000L, 7L).foreach { bw =>
      val bucketized = RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi", bw)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      withClue(s"binWidth=$bw: ") { bucketized shouldBe naive }
    }
  }
}
