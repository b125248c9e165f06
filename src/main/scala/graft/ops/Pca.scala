package graft.ops

import org.apache.spark.sql.DataFrame

import graft.functions.PortableRounding

/** Principal component extraction over a float-vector column: exact
  * distributed covariance + driver-side power iteration — the classic
  * two-phase shape (MLlib RowMatrix.computeCovariance + breeze eig)
  * rebuilt deterministic and oracle-checkable.
  *
  * Scale shape: the covariance pass is ONE mapPartitions sweep
  * accumulating a dim×(dim+1)+1 Gram buffer per partition (a few KB),
  * reduced to the driver — shuffle bytes O(partitions × dim²),
  * independent of corpus size; the corpus is never shuffled. The
  * power iteration then runs on the bounded dim×dim driver artifact
  * (64×64 here — microseconds), exactly like the k-means centroid
  * loop. This is THE 100 TB PCA recipe: at a billion rows the Gram
  * pass is still one scan and the driver matrix is still 32 KB.
  *
  * Cross-engine determinism protocol (same family as Kmeans):
  * means and covariance entries rounded to 6 decimals; the iterate is
  * re-normalized and ROUNDED to 8 decimals every iteration, so both
  * engines walk identical vectors (summation-order drift ~1e-14 per
  * entry vs the 5e-9 rounding boundary); fixed iteration count, fixed
  * uniform init (1/8 per dim for dim=64 — exact in binary).
  */
object Pca {

  /** Exact covariance C = S/n − μμᵀ with μ and C rounded to 6. Returns
    * (n, mu, C). One pass; no corpus shuffle. */
  def covariance(df: DataFrame, vecCol: String, dim: Int): (Long, Array[Double], Array[Array[Double]]) = {
    val spark = df.sparkSession
    import spark.implicits._
    val acc = df.select(vecCol).as[Array[Float]]
      .mapPartitions { it =>
        // layout: [0, dim²) pair sums, [dim², dim²+dim) per-dim sums, last = count
        val a = new Array[Double](dim * dim + dim + 1)
        it.foreach { v =>
          var i = 0
          while (i < dim) {
            val xi = v(i).toDouble
            a(dim * dim + i) += xi
            var j = 0
            while (j < dim) { a(i * dim + j) += xi * v(j).toDouble; j += 1 }
            i += 1
          }
          a(dim * dim + dim) += 1.0
        }
        Iterator.single(a)
      }
      .reduce { (a, b) =>
        val r = new Array[Double](a.length)
        var i = 0
        while (i < a.length) { r(i) = a(i) + b(i); i += 1 }
        r
      }
    val n = acc(dim * dim + dim)
    val mu = Array.tabulate(dim)(i => PortableRounding.round(acc(dim * dim + i) / n, 6))
    val c = Array.tabulate(dim, dim)((i, j) =>
      PortableRounding.round(acc(i * dim + j) / n - mu(i) * mu(j), 6))
    (n.toLong, mu, c)
  }

  /** Power iteration on the (rounded) covariance: `iters` rounds of
    * v ← round(Cv / ‖Cv‖, 8) from the uniform init. Returns the final
    * unit iterate. */
  def powerIterate(c: Array[Array[Double]], iters: Int): Array[Double] = {
    val dim = c.length
    val init = 1.0 / math.sqrt(dim.toDouble) // 1/8 for dim 64 — exact
    var v = Array.fill(dim)(init)
    var it = 0
    while (it < iters) {
      val w = Array.tabulate(dim) { i =>
        var s = 0.0
        var j = 0
        while (j < dim) { s += c(i)(j) * v(j); j += 1 }
        s
      }
      var n2 = 0.0
      var i = 0
      while (i < dim) { n2 += w(i) * w(i); i += 1 }
      val norm = math.sqrt(n2)
      v = w.map(x => PortableRounding.round(x / norm, 8))
      it += 1
    }
    v
  }

  /** Rayleigh quotient λ = vᵀCv and the share of total variance it
    * explains (λ / trace C), plus the dominant-loading dim (abs argmax,
    * lowest index on ties). One row. */
  def leadingComponent(df: DataFrame, vecCol: String, dim: Int, iters: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (_, _, c) = covariance(df, vecCol, dim)
    val v = powerIterate(c, iters)
    val w = Array.tabulate(dim) { i =>
      var s = 0.0
      var j = 0
      while (j < dim) { s += c(i)(j) * v(j); j += 1 }
      s
    }
    var lambda = 0.0
    var trace = 0.0
    var i = 0
    while (i < dim) { lambda += v(i) * w(i); trace += c(i)(i); i += 1 }
    val topDim = v.zipWithIndex.map { case (x, d) => (math.abs(x), d) }
      .reduceLeft((a, b) => if (b._1 > a._1) b else a)._2
    Seq((PortableRounding.round(lambda, 6),
      PortableRounding.round(lambda / trace, 6), topDim))
      .toDF("lambda", "explained_ratio", "top_dim")
  }
}
