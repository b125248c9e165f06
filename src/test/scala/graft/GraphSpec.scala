package graft

import org.scalatest.matchers.should.Matchers

import graft.ops.Graph

class GraphSpec extends SparkSpec with Matchers {

  private def ranksOf(edges: Seq[(Long, Long)], iters: Int = 5): Map[Long, Double] = {
    val df = spark.createDataFrame(edges).toDF("src", "dst")
    val out = Graph.pageRank(df, iters = iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    graft.core.PlanCache.release(spark)
    out
  }

  test("pagerank is uniform on a regular graph and conserves total mass") {
    val n = 6
    val cycle = (0 until n).flatMap { i =>
      Seq((i.toLong, ((i + 1) % n).toLong), (((i + 1) % n).toLong, i.toLong))
    }
    val pr = ranksOf(cycle)
    pr.size shouldBe n
    pr.values.sum shouldBe 1.0 +- 1e-9 // no dangling mass on a symmetric graph
    pr.values.foreach(_ shouldBe (1.0 / n) +- 1e-9) // regular graph ⇒ uniform fixed point
  }

  test("star graph: the hub outranks every leaf, leaves tie") {
    val star = (1L to 9L).flatMap(l => Seq((0L, l), (l, 0L)))
    val pr = ranksOf(star)
    val leafRanks = (1L to 9L).map(pr)
    leafRanks.foreach(_ shouldBe leafRanks.head +- 1e-12)
    pr(0L) should be > leafRanks.head * 3
  }

  test("relative form is rank scaled by node count") {
    val star = (1L to 4L).flatMap(l => Seq((0L, l), (l, 0L)))
    val df = spark.createDataFrame(star).toDF("src", "dst")
    val abs = Graph.pageRank(df, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rel = Graph.pageRank(df, iters = 3, relative = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    graft.core.PlanCache.release(spark)
    rel.foreach { case (id, v) => v shouldBe abs(id) * 5 +- 1e-12 }
  }

  test("more iterations move a chain's ranks monotonically toward the hub") {
    // path 0-1-2-3-4 symmetrized: the middle node gains rank with depth
    val path = (0L until 4L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
    val r1 = ranksOf(path, iters = 1)
    val r8 = ranksOf(path, iters = 8)
    r8(2L) should be > r1(2L) - 1e-12
    r8(0L) should be < r8(2L) // endpoints below the center at the fixed point
  }
}
