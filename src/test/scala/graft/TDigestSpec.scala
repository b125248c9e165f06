package graft

import org.scalatest.matchers.should.Matchers

import graft.functions.TDigestAgg

class TDigestSpec extends SparkSpec with Matchers {

  private def exactQ(xs: Array[Double], q: Double): Double = {
    val s = xs.sorted
    val pos = q * (s.length - 1)
    val lo = pos.toInt
    val frac = pos - lo
    if (lo + 1 < s.length) s(lo) * (1 - frac) + s(lo + 1) * frac else s(lo)
  }

  test("digest quantiles track exact quantiles on uniform and skewed data") {
    val rnd = new scala.util.Random(7)
    val uniform = Array.fill(20000)(rnd.nextDouble() * 1000.0)
    val skewed = Array.fill(20000)(math.exp(rnd.nextGaussian() * 2.0))
    for (xs <- Seq(uniform, skewed)) {
      val agg = new TDigestAgg.Agg(Seq(0.5))
      var buf = agg.zero
      xs.foreach(x => buf = agg.reduce(buf, x))
      val (m, w) = TDigestAgg.compress(buf.means, buf.weights, buf.tail.toArray)
      for (q <- Seq(0.01, 0.1, 0.5, 0.9, 0.99)) {
        val est = TDigestAgg.quantile(m, w, q)
        val ex = exactQ(xs, q)
        // rank-error check: the estimate's exact rank must be within
        // 1.5% of the requested rank (t-digest's guarantee is in rank
        // space, not value space)
        val rank = xs.count(_ <= est).toDouble / xs.length
        withClue(s"q=$q est=$est exact=$ex rank=$rank:") {
          math.abs(rank - q) should be <= 0.015
        }
      }
      m.length should be <= (2 * TDigestAgg.Compression).toInt
    }
  }

  test("merging partial digests preserves the error envelope and the size bound") {
    val rnd = new scala.util.Random(11)
    val xs = Array.fill(30000)(rnd.nextGaussian() * 50.0 + 200.0)
    val agg = new TDigestAgg.Agg(Seq(0.5))
    // 10 partitions digested independently, then merged pairwise
    val parts = xs.grouped(3000).map { part =>
      var b = agg.zero
      part.foreach(x => b = agg.reduce(b, x))
      b
    }.toSeq
    val merged = parts.reduce((a, b) => agg.merge(a, b))
    val (m, w) = TDigestAgg.compress(merged.means, merged.weights, merged.tail.toArray)
    m.length should be <= (2 * TDigestAgg.Compression).toInt
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val est = TDigestAgg.quantile(m, w, q)
      val rank = xs.count(_ <= est).toDouble / xs.length
      withClue(s"q=$q:") { math.abs(rank - q) should be <= 0.015 }
    }
  }

  test("aggregator runs distributed with group-by and matches exact within tolerance") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(3)
    val df = (1 to 40000).map(i => (i % 3, rnd.nextDouble() * 100.0)).toDF("g", "x")
      .repartition(16)
    val r = df.groupBy($"g")
      .agg(TDigestAgg.quantiles($"x", Seq(0.5, 0.99)).as("td"),
        percentile($"x", lit(0.5)).as("ex50"),
        percentile($"x", lit(0.99)).as("ex99"))
      .collect()
    r.length shouldBe 3
    for (row <- r) {
      val td = row.getSeq[Double](1)
      td.length shouldBe 3 // two quantiles + centroid count
      math.abs(td(0) - row.getDouble(2)) / row.getDouble(2) should be <= 0.05
      math.abs(td(1) - row.getDouble(3)) / row.getDouble(3) should be <= 0.05
      td(2) should be <= 2 * TDigestAgg.Compression
    }
  }

  test("digest-of-digests rollup preserves the rank-error envelope") {
    val rnd = new scala.util.Random(19)
    val xs = Array.fill(25000)(math.pow(rnd.nextDouble(), 3.0) * 500.0)
    val st = new TDigestAgg.StateAgg
    val shards = xs.grouped(1250).map { part =>
      var b = st.zero
      part.foreach(x => b = st.reduce(b, x))
      st.finish(b)
    }.toSeq
    val mg = new TDigestAgg.MergeAgg(Seq(0.5))
    var acc = mg.zero
    shards.foreach(d => acc = mg.reduce(acc, d))
    val (m, w) = TDigestAgg.compress(acc.means, acc.weights, acc.tail.toArray)
    m.length should be <= (2 * TDigestAgg.Compression).toInt
    w.sum shouldBe 25000.0 +- 1e-6 // no mass lost through the rollup
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val est = TDigestAgg.quantile(m, w, q)
      val rank = xs.count(_ <= est).toDouble / xs.length
      withClue(s"q=$q:") { math.abs(rank - q) should be <= 0.02 }
    }
  }

  test("weighted census ingest equals raw-multiset ingest in rank space") {
    val rnd = new scala.util.Random(23)
    // discrete values so the census genuinely compacts (akin to prices)
    val xs = Array.fill(20000)((rnd.nextInt(500) + 1) * 0.25)
    val census = xs.groupBy(identity).map { case (v, arr) => (v, arr.length.toDouble) }.toArray
    val wst = new graft.functions.TDigestAgg.WeightedStateAgg
    var b = wst.zero
    census.foreach(d => b = wst.reduce(b, d))
    val (m, w) = wst.finish(b)
    w.sum shouldBe 20000.0 +- 1e-6
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val est = TDigestAgg.quantile(m.toArray, w.toArray, q)
      val rank = xs.count(_ <= est).toDouble / xs.length
      withClue(s"q=$q:") { math.abs(rank - q) should be <= 0.02 }
    }
  }

  test("degenerate inputs: empty tail, single value, constant column") {
    val agg = new TDigestAgg.Agg(Seq(0.5))
    val empty = agg.finish(agg.zero)
    empty.head.isNaN shouldBe true
    empty(1) shouldBe 0.0
    var b = agg.zero
    b = agg.reduce(b, 42.0)
    agg.finish(b) shouldBe Seq(42.0, 1.0)
    var c = agg.zero
    (1 to 1000).foreach(_ => c = agg.reduce(c, 7.0))
    val out = agg.finish(c)
    out.head shouldBe 7.0
  }
}
