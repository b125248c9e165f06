package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.{RoundPortableExpr, VectorFunctions}

/** Distributed Lloyd's k-means over a float-vector column — the classic
  * clustering primitive behind IVF cell training, corpus stratification,
  * and topic-bucket assignment in curation pipelines.
  *
  * Scale shape (the MLlib shape, rebuilt deterministic): centroids are a
  * bounded k×dim artifact that lives on the driver and BROADCASTS into
  * the assignment map — the corpus is never shuffled for assignment. The
  * per-iteration centroid update is one keyed aggregation of (cluster,
  * dim, sum, count) — a k×dim-cell grid — via posexplode, i.e. shuffle
  * bytes are O(partitions × k × dim) partial rows after map-side
  * combine, independent of corpus size. Iterations are a fixed count
  * (no data-dependent convergence loop), so the job graph is static.
  *
  * Cross-engine determinism protocol (what makes the op
  * oracle-checkable against DuckDB):
  *   - init: centroids = the k vectors with the LOWEST ids (float32 →
  *     float64 widening is exact on both engines);
  *   - assignment: squared L2 distance computed in double, ROUNDED to 6
  *     decimals, argmin with cluster-id tiebreak (array_sort on
  *     (dist, cid) structs — lexicographic on both engines);
  *   - update: per-dim mean rounded to 6 decimals. Summation-order
  *     float drift (~1e-13) is far inside the 5e-7 rounding boundary,
  *     so both engines see bit-identical centroids each round.
  */
object Kmeans {

  /** One Lloyd's assignment pass: cluster id of the nearest centroid
    * (rounded-distance argmin, cluster-id tiebreak), map-side only. */
  def assign(df: DataFrame, vecCol: String, centroids: Array[Array[Double]]): DataFrame = {
    val scored = centroids.zipWithIndex.map { case (c, cid) =>
      struct(
        RoundPortableExpr.r(
          VectorFunctions.l2SqDistance(col(vecCol), typedlit(c.toSeq)), 6).as("d"),
        lit(cid).as("cid"))
    }
    df.withColumn("cluster", array_sort(array(scored: _*)).getItem(0).getField("cid"))
  }

  /** Fixed-iteration Lloyd's. Returns the assigned corpus (input columns
    * + `cluster`) and the final centroids. `idCol` orders the
    * deterministic seed pick. */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int)
      : (DataFrame, Array[Array[Double]]) = {
    require(k > 0 && iters >= 0, "k and iters must be positive")
    // Seed: the k lowest-id vectors. Bounded collect (k rows).
    var centroids: Array[Array[Double]] = df
      .orderBy(col(idCol))
      .select(col(vecCol))
      .limit(k)
      .collect()
      .map(r => r.getSeq[Float](0).map(_.toDouble).toArray)
    var it = 0
    while (it < iters) {
      val assigned = assign(df, vecCol, centroids)
      // Update: (cluster, dim) grid agg — k×dim result rows, map-side
      // combined. Collect is the bounded centroid artifact, not data.
      val grid = assigned
        .select(col("cluster"), posexplode(col(vecCol)).as(Seq("dim", "x")))
        .groupBy(col("cluster"), col("dim"))
        .agg(RoundPortableExpr.r(avg(col("x").cast("double")), 6).as("c"))
        .collect()
      val next = centroids.map(_.clone())
      grid.foreach { case Row(cid: Int, dim: Int, v: Double) => next(cid)(dim) = v }
      centroids = next
      it += 1
    }
    (assign(df, vecCol, centroids), centroids)
  }

  /** Clustering-quality report: per-cluster size, scatter (mean
    * euclidean distance to the centroid) and Davies–Bouldin component
    * (max over other clusters of (sᵢ+sⱼ)/‖cᵢ−cⱼ‖ — lower = better
    * separated). The scatter agg is the one corpus pass; the k×k
    * separation grid is driver arithmetic on the bounded centroid
    * artifact. Scatters rounded to 6 before the ratio, so the ratio and
    * its max are bit-identical cross-engine; degenerate pairs with
    * coincident centroids are excluded (ratio undefined). */
  def daviesBouldin(assigned: DataFrame, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val scored = centroids.zipWithIndex.map { case (c, cid) =>
      struct(
        graft.functions.RoundPortableExpr.r(
          VectorFunctions.l2SqDistance(col(vecCol), typedlit(c.toSeq)), 6).as("d"),
        lit(cid).as("cid"))
    }
    val scat = assigned
      .withColumn("best", array_sort(array(scored: _*)).getItem(0))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_points"),
        graft.functions.RoundPortableExpr.r(
          avg(sqrt(col("best").getField("d"))), 6).as("scatter"))
    val k = centroids.length
    val seps = for {
      i <- 0 until k
      j <- 0 until k if i != j
    } yield {
      var s = 0.0
      var x = 0
      while (x < centroids(i).length) {
        val dd = centroids(i)(x) - centroids(j)(x)
        s += dd * dd
        x += 1
      }
      (i, j, graft.functions.PortableRounding.round(math.sqrt(s), 6))
    }
    val sepDf = seps.toDF("ci", "cj", "m")
    val ratios = sepDf.where(col("m") > 0)
      .join(broadcast(scat.select(col("cluster").as("ci"), col("scatter").as("si"))), "ci")
      .join(broadcast(scat.select(col("cluster").as("cj"), col("scatter").as("sj"))), "cj")
      .groupBy(col("ci"))
      .agg(max((col("si") + col("sj")) / col("m")).as("dbraw"))
    scat.join(ratios, scat("cluster") === ratios("ci"))
      .select(col("cluster"), col("n_points"), col("scatter"),
        graft.functions.RoundPortableExpr.r(col("dbraw"), 6).as("db"))
  }

  /** Census + inertia of a fitted clustering: per-cluster size and the
    * summed (rounded) squared distance to the final centroid. */
  def summary(assigned: DataFrame, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    val scored = centroids.zipWithIndex.map { case (c, cid) =>
      struct(
        RoundPortableExpr.r(
          VectorFunctions.l2SqDistance(col(vecCol), typedlit(c.toSeq)), 6).as("d"),
        lit(cid).as("cid"))
    }
    assigned
      .withColumn("best", array_sort(array(scored: _*)).getItem(0))
      .groupBy(col("cluster"))
      .agg(
        count(lit(1)).as("n_points"),
        RoundPortableExpr.r(sum(col("best").getField("d")), 3).as("inertia"))
  }
}
