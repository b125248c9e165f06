package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.functions.VectorFunctions
import graft.ops.Dedup

/** SemDeDup (Abbas et al. 2023): seeded-centroid assignment +
  * within-cluster near-dup pruning. The registry query uses the
  * deterministic min-id seeds (oracle-portable); this spec additionally
  * runs the op with FITTED MLlib KMeans centroids to pin that any small
  * (cluster, centroid) table works — the shape a real pipeline uses. */
class SemanticDedupSpec extends SparkSpec with Matchers {

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")

  test("clusters partition the input and drops are justified near-dups") {
    val seeds = Dedup.seedCentroids(emb, "vec_id", "embedding", k = 4)
    val out = Dedup.semanticDedup(emb, "vec_id", "embedding", seeds, pairThreshold = 0.7)
      .collect()
    core.PlanCache.release(spark)
    out.map(_.getAs[Long]("n_members")).sum shouldBe emb.count()
    out.foreach { r =>
      r.getAs[Long]("n_dropped") should be <= r.getAs[Long]("n_members")
      r.getAs[Double]("mean_cdist") should (be >= 0.0 and be <= 2.0)
    }
    // at this threshold the fixture must actually exercise the prune
    out.map(_.getAs[Long]("n_dropped")).sum should be > 0L
  }

  test("survivor of a mutual near-dup pair is the one farther from its centroid") {
    import spark.implicits._
    // two near-identical vectors (near-dup pair) + one far-away vector,
    // single centroid at the origin-ish seed: the pair member CLOSER to
    // the centroid must be the dropped one
    val rows = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.14f, 0.0f)), // ~cos 0.990 to id 1
      (3L, Array(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val centroid = Seq((0L, Array(1.0f, 0.05f, 0.0f))).toDF("cluster", "centroid")
    val out = Dedup.semanticDedup(rows, "vec_id", "embedding", centroid, pairThreshold = 0.05)
      .collect().head
    core.PlanCache.release(spark)
    out.getAs[Long]("n_members") shouldBe 3L
    // ids 1,2 are near-dups; id 1 is closer to the centroid → dropped;
    // id 2 (farther, less typical) survives; id 3 has no near-dup
    out.getAs[Long]("n_dropped") shouldBe 1L
    val dropped = Dedup.semanticDedup(rows, "vec_id", "embedding", centroid, pairThreshold = 0.05)
    core.PlanCache.release(spark)
    // re-derive which one was dropped by brute force to pin the keep rule
    val d1 = VectorFunctions.cosineDistance(lit(Array(1.0f, 0.0f, 0.0f)), lit(Array(1.0f, 0.05f, 0.0f)))
    val d2 = VectorFunctions.cosineDistance(lit(Array(0.99f, 0.14f, 0.0f)), lit(Array(1.0f, 0.05f, 0.0f)))
    val Array(v1, v2) = spark.range(1).select(d1.as("a"), d2.as("b"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).flatMap(t => Array(t._1, t._2))
    assert(v1 < v2, "fixture assumption: id 1 is the more central member")
  }

  test("fitted MLlib KMeans centroids drive the same pipeline") {
    import spark.implicits._
    val kmeans = new org.apache.spark.ml.clustering.KMeans()
      .setK(4).setSeed(7L).setMaxIter(5)
      .setFeaturesCol("features").setPredictionCol("cluster")
    val feats = graft.ops.MlAnn.withNormalizedFeatures(
      emb.select(col("vec_id"), col("embedding")), "embedding")
    val model = kmeans.fit(feats.select("features"))
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i.toLong, c.toArray.map(_.toFloat))
    }.toSeq.toDF("cluster", "centroid")
    val out = Dedup.semanticDedup(emb, "vec_id", "embedding", centroids, pairThreshold = 0.7)
      .collect()
    core.PlanCache.release(spark)
    out.map(_.getAs[Long]("n_members")).sum shouldBe emb.count()
    out.length should be <= 4
  }
}
