package graft

import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.ops.{Forecast, Kmeans}

class StatsOpsSpec extends SparkSpec with Matchers {

  // ---- L2SqDistance kernel ----

  test("l2_sq_distance computes the exact squared euclidean distance") {
    import spark.implicits._
    val df = Seq((1L, Array(1.0f, 2.0f, 3.0f))).toDF("id", "v")
    val d = df.select(
      VectorFunctions.l2SqDistance($"v", typedlit(Seq(0.0, 0.0, 0.0))).as("d"))
      .head().getDouble(0)
    d shouldBe 14.0
    val d2 = df.select(
      VectorFunctions.l2SqDistance($"v", typedlit(Seq(1.0, 2.0, 3.0))).as("d"))
      .head().getDouble(0)
    d2 shouldBe 0.0
  }

  test("l2_sq_distance throws on dimension mismatch") {
    import spark.implicits._
    val df = Seq((1L, Array(1.0f, 2.0f))).toDF("id", "v")
    val ex = intercept[Exception] {
      df.select(VectorFunctions.l2SqDistance($"v", typedlit(Seq(1.0))).as("d"))
        .collect()
    }
    ex.getMessage should include("dimension mismatch")
  }

  // ---- Lloyd's k-means ----

  test("kmeans separates well-separated clusters and reaches their means") {
    import spark.implicits._
    // two tight blobs far apart in 2-d
    val pts = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(0.2f, 0.0f)), (2L, Array(0.0f, 0.2f)),
      (3L, Array(10.0f, 10.0f)), (4L, Array(10.2f, 10.0f)), (5L, Array(10.0f, 10.2f)))
      .toDF("vec_id", "embedding")
    val (assigned, cents) = Kmeans.fit(pts, "vec_id", "embedding", k = 2, iters = 3)
    val byCluster = assigned.select($"vec_id", $"cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // one blob per cluster
    Set(0L, 1L, 2L).map(byCluster) should have size 1
    Set(3L, 4L, 5L).map(byCluster) should have size 1
    byCluster(0L) should not be byCluster(3L)
    // converged centroids = blob means (rounded protocol keeps 6 decimals)
    val lowCid = byCluster(0L)
    cents(lowCid)(0) shouldBe 0.066667 +- 1e-6
    cents(lowCid)(1) shouldBe 0.066667 +- 1e-6
    val hiCid = byCluster(3L)
    cents(hiCid)(0) shouldBe 10.066667 +- 1e-4
  }

  test("kmeans keeps the previous centroid for a cluster that loses all points") {
    import spark.implicits._
    // k=3 seeds on 3 lowest ids, but points 0,1 coincide: the cluster
    // seeded at the duplicate loses every point to the lower cid on the
    // deterministic tiebreak and must retain its seed centroid.
    val pts = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(0.0f, 0.0f)),
      (2L, Array(5.0f, 5.0f)), (3L, Array(9.0f, 9.0f)))
      .toDF("vec_id", "embedding")
    val (assigned, cents) = Kmeans.fit(pts, "vec_id", "embedding", k = 3, iters = 2)
    // cluster 1 (seeded at the duplicate of cluster 0's seed) is empty
    val sizes = assigned.groupBy($"cluster").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    sizes.getOrElse(1, 0L) shouldBe 0L
    cents(1) shouldBe Array(0.0, 0.0) // retained, not NaN/garbage
    sizes(0) shouldBe 2L
  }

  test("kmeans summary census covers every point and inertia is near zero on exact fit") {
    import spark.implicits._
    val pts = Seq(
      (0L, Array(1.0f, 1.0f)), (1L, Array(1.0f, 1.0f)),
      (2L, Array(4.0f, 4.0f)), (3L, Array(4.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val (assigned, cents) = Kmeans.fit(pts, "vec_id", "embedding", k = 2, iters = 2)
    val sum = Kmeans.summary(assigned, "embedding", cents).collect()
    sum.map(_.getLong(1)).sum shouldBe 4L
    sum.foreach(r => r.getDouble(2) shouldBe 0.0 +- 1e-9)
  }

  // ---- Holt double exponential smoothing ----

  test("holt on a constant series keeps level constant and trend zero") {
    import spark.implicits._
    val df = (1L to 10L).map(t => ("k", t, 5.0)).toDF("key", "t", "y")
    val out = Forecast.holt(df, "key", "t", "y", alpha = 0.5, beta = 0.25)
      .orderBy($"t").collect()
    out should have length 10
    out.foreach { r =>
      r.getDouble(2) shouldBe 5.0 +- 1e-12 // level
      r.getDouble(3) shouldBe 0.0 +- 1e-12 // trend
      r.getDouble(4) shouldBe 5.0 +- 1e-12 // forecast
    }
  }

  test("holt tracks a perfect linear trend exactly after initialization") {
    import spark.implicits._
    // y_t = 2t: init level=y1=2, trend=y2-y1=2 → the recursion stays on
    // the line and every one-step forecast is exact.
    val df = (1L to 12L).map(t => ("k", t, 2.0 * t)).toDF("key", "t", "y")
    val out = Forecast.holt(df, "key", "t", "y", alpha = 0.5, beta = 0.25)
      .orderBy($"t").collect()
    out.foreach { r =>
      val t = r.getLong(1)
      r.getDouble(2) shouldBe 2.0 * t +- 1e-9 // level on the line
      r.getDouble(3) shouldBe 2.0 +- 1e-9 // slope recovered
      r.getDouble(4) shouldBe 2.0 * (t + 1) +- 1e-9 // exact forecast
    }
  }

  test("holt-winters locks a pure seasonal series: level/trend/seasonal stay fixed") {
    import spark.implicits._
    // y = 10 + p[(t-1) % 3], p = (2, -1, -1): two identical seasons make
    // the classic init EXACT (l=10, b=0, s=p), so the recursion is a
    // fixed point and every one-step forecast equals the next y.
    val p = Array(2.0, -1.0, -1.0)
    val ys = (1L to 10L).map(t => ("k", t, 10.0 + p(((t - 1) % 3).toInt)))
    val df = ys.toDF("key", "t", "y")
    val out = Forecast.holtWinters(df, "key", "t", "y", period = 3,
        alpha = 0.5, beta = 0.25, gamma = 0.25)
      .orderBy($"t").collect()
    out.map(_.getLong(1)) shouldBe (4L to 10L).toArray // recursion starts at m+1
    out.foreach { r =>
      val t = r.getLong(1)
      r.getDouble(2) shouldBe 10.0 +- 1e-9 // level
      r.getDouble(3) shouldBe 0.0 +- 1e-9 // trend
      r.getDouble(4) shouldBe p(((t - 1) % 3).toInt) +- 1e-9 // seasonal re-estimate
      if (t < 10) { // forecast for t+1 is exact
        r.getDouble(5) shouldBe (10.0 + p((t % 3).toInt)) +- 1e-9
      }
    }
  }

  test("holt-winters drops keys with fewer than 2*period+1 observations") {
    import spark.implicits._
    val df = (1L to 6L).map(t => ("short", t, 1.0)).toDF("key", "t", "y")
    Forecast.holtWinters(df, "key", "t", "y", period = 3,
      alpha = 0.5, beta = 0.25, gamma = 0.25).count() shouldBe 0L
  }

  test("cusum accumulates drift-adjusted deviations, resets at zero, alarms past threshold") {
    import spark.implicits._
    // z = [1, 1, -3, 1], drift 0.5, threshold 0.9:
    //   spos = 0.5, 1.0, 0.0 (reset), 0.5
    //   sneg = 0.0, 0.0, 2.5,          1.0
    //   alarm =  0,   1,   1,            1
    val df = Seq(("k", 1L, 1.0), ("k", 2L, 1.0), ("k", 3L, -3.0), ("k", 4L, 1.0))
      .toDF("key", "t", "z")
    val out = Forecast.cusum(df, "key", "t", "z", drift = 0.5, threshold = 0.9)
      .orderBy($"t").collect()
      .map(r => (r.getDouble(2), r.getDouble(3), r.getInt(4)))
    out shouldBe Array((0.5, 0.0, 0), (1.0, 0.0, 1), (0.0, 2.5, 1), (0.5, 1.0, 1))
  }

  test("cusum treats keys independently") {
    import spark.implicits._
    val df = Seq(("a", 1L, 5.0), ("b", 1L, 0.0)).toDF("key", "t", "z")
    val out = Forecast.cusum(df, "key", "t", "z", drift = 0.5, threshold = 1.0)
      .collect().map(r => r.getString(0) -> ((r.getDouble(2), r.getInt(4)))).toMap
    out("a") shouldBe ((4.5, 1))
    out("b") shouldBe ((0.0, 0))
  }

  test("holt handles multiple keys independently and singleton series") {
    import spark.implicits._
    val df = (Seq(("a", 1L, 3.0), ("a", 2L, 4.0), ("b", 1L, 7.0)))
      .toDF("key", "t", "y")
    val out = Forecast.holt(df, "key", "t", "y", alpha = 0.5, beta = 0.25)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(4)).toMap
    // singleton: level=y, trend=0 → forecast = y
    out(("b", 1L)) shouldBe 7.0
    // series a at t=1: level=3, trend=1 → forecast 4
    out(("a", 1L)) shouldBe 4.0
    out.size shouldBe 3
  }

  test("ml_ridge: lambda=0 reproduces OLS, and shrinkage is monotone in lambda") {
    val dir = "/root/testdata/sf0.001"
    val ridge = SparkEntry.queries("ml_ridge")(spark, dir).collect()
      .map(r => (r.getDouble(0), r.getDouble(2), r.getDouble(3))).sortBy(_._1)
    val ols = SparkEntry.queries("ml_linreg")(spark, dir).head()
    ridge.head._1 shouldBe 0.0
    ridge.head._2 shouldBe ols.getDouble(1) // b1 at lambda=0 == OLS b1
    ridge.head._3 shouldBe ols.getDouble(2)
    // per-observation L2 penalty only shrinks: |b| non-increasing
    ridge.sliding(2).foreach { case Array((_, b1a, b2a), (_, b1b, b2b)) =>
      math.abs(b1b) should be <= math.abs(b1a) + 1e-9
      math.abs(b2b) should be <= math.abs(b2a) + 1e-9
    }
  }

  test("ml_conformal: the 90% marginal-coverage guarantee holds on the test split") {
    val r = SparkEntry.queries("ml_conformal")(spark, "/root/testdata/sf0.001").head()
    val nCal = r.getLong(0); val k = r.getLong(1)
    k shouldBe (9 * (nCal + 1) + 9) / 10 // the finite-sample rank
    val coverage = r.getDouble(5)
    // split-conformal: P(cover) ∈ [0.9, 0.9 + 1/(n_cal+1)] in
    // expectation; the empirical check allows sampling slack
    coverage should be >= 0.86
    coverage should be <= 0.95
  }
}
