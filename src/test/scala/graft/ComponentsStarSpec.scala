package graft

import org.scalatest.matchers.should.Matchers

import graft.ops.Components

/** Convergence + correctness contract of the large-star/small-star
  * connected-components contraction (Kiveris et al., SoCC 2014):
  * rounds scale with log n, NOT graph diameter — the property that
  * keeps an adversarial long-chain duplicate cluster from costing
  * O(diameter) shuffle rounds at 100 TB. */
class ComponentsStarSpec extends SparkSpec with Matchers {
  import spark.implicits._

  /** Force the DISTRIBUTED contraction (the 100 TB path) — the default
    * size-adaptive local finish would absorb these small fixtures. */
  private def distributed[T](body: => T): T = {
    spark.conf.set("spark.graft.cc.localEdgeMax", "0")
    try body finally spark.conf.unset("spark.graft.cc.localEdgeMax")
  }

  test("10k-node path graph converges in ~log2(n) rounds, not diameter") {
    val n = 10000L
    val nodes = spark.range(n).toDF("id")
    val edges = spark.range(n - 1).selectExpr("id AS src", "id + 1 AS dst")
    val (labels, rounds) = distributed {
      Components.connectedComponentsWithStats(nodes, edges)
    }
    // diameter is 9999; label propagation would need 9999 rounds.
    // ceil(log2(10000)) = 14 — allow up to 20 for alternation overhead.
    rounds should be <= 20
    val comps = labels.select("component").distinct().as[Long].collect()
    comps shouldBe Array(0L)
    labels.count() shouldBe n
  }

  test("star contraction agrees with label propagation on a clustered graph") {
    // several clumps + a chain + singletons — the dedup-shaped mixture
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),              // triangle {1,2,3}
      (10L, 11L), (11L, 12L),                    // chain {10,11,12}
      (20L, 21L),                                // pair
      (30L, 31L), (31L, 32L), (32L, 33L), (33L, 34L) // path of 5
    ).toDF("src", "dst")
    val nodes = (1L to 40L).toDF("id")
    val star = Components.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    val prop = Components.labelPropagation(nodes, edges)
      .as[(Long, Long)].collect().toMap
    star shouldBe prop
    star(3L) shouldBe 1L
    star(34L) shouldBe 30L
    star(40L) shouldBe 40L // singleton keeps its own label
  }

  test("isolated nodes and duplicate/reversed edges are handled") {
    val nodes = Seq(5L, 6L, 7L).toDF("id")
    val edges = Seq((6L, 5L), (5L, 6L), (6L, 5L)).toDF("src", "dst")
    val labels = Components.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    labels shouldBe Map(5L -> 5L, 6L -> 5L, 7L -> 7L)
  }

  test("non-convergence raises instead of returning wrong labels") {
    val n = 200L
    val nodes = spark.range(n).toDF("id")
    val edges = spark.range(n - 1).selectExpr("id AS src", "id + 1 AS dst")
    // label propagation needs diameter rounds; 5 is not enough — it
    // must fail LOUDLY (ADVICE r3: silent partial labels would let
    // dedup_keep_one prune the wrong documents)
    an[IllegalStateException] should be thrownBy
      Components.labelPropagation(nodes, edges, maxIters = 5)
    an[IllegalStateException] should be thrownBy distributed {
      Components.connectedComponentsWithStats(nodes, edges, maxIters = 2)
    }
  }

  test("size-adaptive local finish matches the distributed contraction") {
    // r12: under the edge bound the labels come from one driver-side
    // union–find collect (rounds = 0) — they must be IDENTICAL to the
    // distributed star contraction's, mixture shape included
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L),
      (20L, 21L),
      (30L, 31L), (31L, 32L), (32L, 33L), (33L, 34L),
      (34L, 30L), (2L, 2L) // cycle-closing + self-loop
    ).toDF("src", "dst")
    val nodes = (1L to 40L).toDF("id")
    val (local, lr) = Components.connectedComponentsWithStats(nodes, edges)
    val dist = distributed { Components.connectedComponents(nodes, edges) }
    lr shouldBe 0
    local.as[(Long, Long)].collect().toMap shouldBe
      dist.as[(Long, Long)].collect().toMap
  }

  test("local-finish bound overflows to the distributed path") {
    // 300 edges with localEdgeMax=100: the bounded probe must NOT
    // collect the graph; the distributed contraction still labels it
    spark.conf.set("spark.graft.cc.localEdgeMax", "100")
    try {
      val n = 301L
      val nodes = spark.range(n).toDF("id")
      val edges = spark.range(n - 1).selectExpr("id AS src", "id + 1 AS dst")
      val (labels, rounds) = Components.connectedComponentsWithStats(nodes, edges)
      rounds should be > 0
      labels.select("component").distinct().as[Long].collect() shouldBe Array(0L)
    } finally spark.conf.unset("spark.graft.cc.localEdgeMax")
  }
}
