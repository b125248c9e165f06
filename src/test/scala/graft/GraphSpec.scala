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

  test("personalized pagerank: mass concentrates around the seed, decays with distance") {
    // path 0-1-2-3-4 symmetrized, seed at the CENTER node 2 — a
    // degree-1 endpoint seed would hand its entire rank to its one
    // neighbor, which then legitimately outranks the seed; the center
    // seed decays monotonically by symmetry. A path graph is also
    // bipartite, so the iteration oscillates with parity and only the
    // damping contracts it (0.85^k) — run enough rounds for the fixed
    // point to show through.
    val path = (0L until 4L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
    val edges = spark.createDataFrame(path).toDF("src", "dst")
    val seeds = spark.createDataFrame(Seq(Tuple1(2L))).toDF("id")
    val pr = Graph.personalizedPageRank(edges, seeds, iters = 60)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    graft.core.PlanCache.release(spark)
    pr(2L) should be > pr(1L)
    pr(1L) shouldBe pr(3L) +- 1e-9 // symmetric arms tie
    pr(1L) should be > pr(0L)
    pr(0L) shouldBe pr(4L) +- 1e-9
    pr.values.sum shouldBe 1.0 +- 1e-9
  }

  test("personalized pagerank ignores seeds outside the graph, throws when none match") {
    val edges = spark.createDataFrame(Seq((0L, 1L), (1L, 0L))).toDF("src", "dst")
    val mixed = spark.createDataFrame(Seq(Tuple1(0L), Tuple1(99L))).toDF("id")
    val pr = Graph.personalizedPageRank(edges, mixed, iters = 60)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    graft.core.PlanCache.release(spark)
    pr.keySet shouldBe Set(0L, 1L) // 99 is not a node and gets no rank row
    pr(0L) should be > pr(1L)
    val none = spark.createDataFrame(Seq(Tuple1(99L))).toDF("id")
    an[IllegalArgumentException] should be thrownBy
      Graph.personalizedPageRank(edges, none, iters = 3)
    graft.core.PlanCache.release(spark)
  }

  test("hits: broad hubs and co-cited authorities rank higher, sides sum to 1") {
    // users 0,1,2 → items 10,11,12: user 0 clicks everything, item 10
    // is clicked by everyone
    val edges = spark.createDataFrame(Seq(
      (0L, 10L), (0L, 11L), (0L, 12L), (1L, 10L), (2L, 10L), (2L, 11L)))
      .toDF("src", "dst")
    val out = Graph.hits(edges, iters = 5)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    graft.core.PlanCache.release(spark)
    val hubs = out.collect { case (("hub", id), s) => id -> s }
    val auths = out.collect { case (("auth", id), s) => id -> s }
    hubs.values.sum shouldBe 1.0 +- 1e-9
    auths.values.sum shouldBe 1.0 +- 1e-9
    hubs(0L) should be > hubs(1L)  // 3-item hub beats 1-item hub
    hubs(2L) should be > hubs(1L)
    auths(10L) should be > auths(11L) // universally-clicked item on top
    auths(11L) should be > auths(12L) // two hubs beat one
  }

  test("triangle census: complete graphs, triangle-free graphs, clustering") {
    def stats(edges: Seq[(Long, Long)]) = {
      val r = Graph.triangleStats(spark.createDataFrame(edges).toDF("u", "v")).head()
      graft.core.PlanCache.release(spark)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    }
    def clique(n: Int) =
      for (i <- 0L until n; j <- i + 1 to n - 1L) yield (i, j)
    stats(clique(3)) shouldBe ((3L, 3L, 3L, 1L, 1.0)) // K3: clustering exactly 1
    stats(clique(4))._4 shouldBe 4L                    // K4 holds C(4,3) triangles
    val star = (1L to 5L).map(l => (0L, l))
    stats(star) shouldBe ((6L, 5L, 10L, 0L, 0.0))      // star: wedges but no closure
    val path = (0L until 4L).map(i => (i, i + 1))
    stats(path)._4 shouldBe 0L                         // path: triangle-free
    // duplicate + reversed edges collapse to the canonical set
    stats(clique(3) ++ clique(3).map(_.swap)) shouldBe ((3L, 3L, 3L, 1L, 1.0))
  }

  test("link prediction: hand-checked scores, hub guard drops hub items") {
    // users 1,2 share items 10,11; user 3 shares only 10 with them;
    // item 99 is a hub everyone touched (df 3 > cap 2 → contributes nothing)
    val uv = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 11L), (2L, 11L),
      (1L, 99L), (2L, 99L), (3L, 99L))
    def run(cap: Int, minShared: Int) =
      Graph.linkPrediction(spark.createDataFrame(uv).toDF("u", "i"), cap, minShared)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val capped = run(2, 1)
    graft.core.PlanCache.release(spark)
    // with the hub (99) and the df-3 item (10) dropped, only 11 remains
    val aa11 = BigDecimal(1.0 / math.log(2.0)).setScale(4, BigDecimal.RoundingMode.HALF_EVEN)
    capped.keySet shouldBe Set((1L, 2L))
    capped((1L, 2L))._1 shouldBe 1L
    capped((1L, 2L))._2 shouldBe aa11.toDouble
    capped((1L, 2L))._3 shouldBe 1.0 // deg(1)=deg(2)=1 over the capped set
    val open = run(3, 1) // cap admits df-3 items: all three pairs appear
    graft.core.PlanCache.release(spark)
    open.keySet shouldBe Set((1L, 2L), (1L, 3L), (2L, 3L))
    open((1L, 2L))._1 shouldBe 3L // shares 10, 11, 99
    open((1L, 3L))._1 shouldBe 2L // shares 10, 99
    // minShared prunes the weaker pairs
    val strict = run(3, 3)
    graft.core.PlanCache.release(spark)
    strict.keySet shouldBe Set((1L, 2L))
  }

  test("more iterations move a chain's ranks monotonically toward the hub") {
    // path 0-1-2-3-4 symmetrized: the middle node gains rank with depth
    val path = (0L until 4L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
    val r1 = ranksOf(path, iters = 1)
    val r8 = ranksOf(path, iters = 8)
    r8(2L) should be > r1(2L) - 1e-12
    r8(0L) should be < r8(2L) // endpoints below the center at the fixed point
  }

  test("labelPropagation: frontier expands one hop per round, seeds clamp, census totals hold") {
    // path 0-1-2-3-4 (symmetric), seed 0 labeled 7: two rounds reach 1 and 2
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
      .flatMap { case (u, v) => Seq((u, v), (v, u)) }
    val edges = spark.createDataFrame(path).toDF("src", "dst")
    val seeds = spark.createDataFrame(Seq((0L, 7L))).toDF("id", "label")
    val census = Graph.labelPropagation(edges, seeds, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.core.PlanCache.release(spark)
    assert(census == Map(7L -> 3L, -1L -> 2L)) // 0,1,2 labeled; 3,4 beyond the horizon
  }

  test("labelPropagation: majority wins, ties break to the smaller label, seeds never flip") {
    // node 9 has two label-5 neighbors and one label-3 neighbor -> 5;
    // node 8 has one of each -> tie -> 3; seed 1 (label 5) adjacent to
    // two label-3 seeds keeps 5
    val edges = spark.createDataFrame(Seq(
      (1L, 9L), (2L, 9L), (3L, 9L),
      (2L, 8L), (3L, 8L),
      (2L, 1L), (3L, 1L)
    ).flatMap { case (u, v) => Seq((u, v), (v, u)) }).toDF("src", "dst")
    val seeds = spark.createDataFrame(Seq((1L, 5L), (2L, 5L), (3L, 3L))).toDF("id", "label")
    val out = Graph.labelPropagation(edges, seeds, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.core.PlanCache.release(spark)
    assert(out == Map(5L -> 3L, 3L -> 2L)) // 9->5 (majority), 8->3 (tie->min), seeds keep 5,5,3
  }

  test("kCore: cascading peel removes the tail AND the node it exposes") {
    // triangle {0,1,2} (the 2-core) + path 2-3-4: round 1 peels 4
    // (deg 1), which drops 3 to deg 1, round 2 peels 3 — fixpoint at
    // the triangle. A single-pass degree filter would keep 3.
    val edges = spark.createDataFrame(Seq(
      (0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L), (3L, 4L))).toDF("u", "v")
    val core = Graph.kCore(edges, k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.core.PlanCache.release(spark)
    assert(core == Map(0L -> 2L, 1L -> 2L, 2L -> 2L))
  }

  test("kCore: k above the degeneracy empties the graph; self-loops and dup edges ignored") {
    val edges = spark.createDataFrame(Seq(
      (0L, 1L), (1L, 0L), (1L, 1L), (1L, 2L), (0L, 2L))).toDF("u", "v")
    val empty = Graph.kCore(edges, k = 3).collect()
    graft.core.PlanCache.release(spark)
    assert(empty.isEmpty)
  }

  test("kCore: reversed-duplicate edges count one degree, not two") {
    // triangle fed with EVERY edge in both directions: canonicalization
    // must collapse (u,v)/(v,u) to one edge, so k=3 (> degeneracy 2)
    // empties the graph — pre-canonicalization the doubled degrees (4)
    // would spuriously survive a 3-core peel.
    val edges = spark.createDataFrame(Seq(
      (0L, 1L), (1L, 0L), (1L, 2L), (2L, 1L), (0L, 2L), (2L, 0L))).toDF("u", "v")
    val atK3 = Graph.kCore(edges, k = 3).collect()
    val atK2 = Graph.kCore(edges, k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.core.PlanCache.release(spark)
    assert(atK3.isEmpty)
    assert(atK2 == Map(0L -> 2L, 1L -> 2L, 2L -> 2L))
  }

  test("kCore: assertFixpoint throws when maxRounds truncates the peel") {
    // 0-1-2-3-4-5 path: each round peels only the two endpoints, so the
    // 2-core fixpoint (empty) needs 2 rounds of actual shrinkage and a
    // 3rd to observe it; maxRounds = 1 truncates mid-peel.
    val edges = spark.createDataFrame(
      (0L to 4L).map(i => (i, i + 1))).toDF("u", "v")
    intercept[IllegalStateException] {
      Graph.kCore(edges, k = 2, maxRounds = 1, assertFixpoint = true).collect()
    }
    graft.core.PlanCache.release(spark)
  }

  test("kCore matches the unrolled SQL twin's shape on a two-shell graph") {
    // 4-clique {0..3} (3-core) with pendant 4-5 chain; k=3 keeps the clique
    val edges = spark.createDataFrame(
      (for { u <- 0L to 3L; v <- (u + 1) to 3L } yield (u, v)) ++
        Seq((3L, 4L), (4L, 5L))).toDF("u", "v")
    val core = Graph.kCore(edges, k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.core.PlanCache.release(spark)
    assert(core == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("bfs: levels expand one hop, unreached nodes report -1, external seeds ignored") {
    import spark.implicits._
    // directed chain 1→2→3→4 plus a disconnected pair 10→11
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("src", "dst")
    val seeds = Seq(1L, 99L).toDF("id") // 99 is not a graph node
    val out = Graph.bfs(edges, seeds, maxDepth = 2).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    graft.core.PlanCache.release(spark)
    out(0) shouldBe ((1L, 1L, 1L)) // the in-graph seed alone
    out(1) shouldBe ((1L, 2L, 2L))
    out(2) shouldBe ((1L, 3L, 3L))
    // 4 (one hop past maxDepth) and the disconnected pair stay unreached
    out(-1) shouldBe ((3L, 4L, 11L))
    out.keySet shouldBe Set(-1, 0, 1, 2)
  }

  test("bfs: a node reachable by two paths takes the shorter distance") {
    import spark.implicits._
    // 1→2→4 and 1→4: 4 must land at dist 1, not 2
    val edges = Seq((1L, 2L), (2L, 4L), (1L, 4L)).toDF("src", "dst")
    val out = Graph.bfs(edges, Seq(1L).toDF("id"), maxDepth = 3).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    graft.core.PlanCache.release(spark)
    out(0) shouldBe 1L
    out(1) shouldBe 2L // both 2 and 4 at dist 1
    out.contains(2) shouldBe false
  }
}
