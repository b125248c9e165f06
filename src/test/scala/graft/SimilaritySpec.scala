package graft

import org.scalatest.matchers.should.Matchers

import graft.ops.Similarity

class SimilaritySpec extends SparkSpec with Matchers {

  private lazy val vecs = {
    import spark.implicits._
    // 3 clusters along axes + the query near cluster 0
    Seq(
      (0L, Seq(1f, 0.01f, 0f, 0f)), (1L, Seq(0.95f, 0.05f, 0f, 0f)),
      (2L, Seq(0.9f, 0.1f, 0f, 0f)), (3L, Seq(0f, 1f, 0f, 0f)),
      (4L, Seq(0f, 0.98f, 0.02f, 0f)), (5L, Seq(0f, 0f, 1f, 0f)),
      (6L, Seq(0.01f, 0f, 0.99f, 0f))
    ).toDF("vec_id", "embedding")
  }

  test("bruteTopK returns exact nearest neighbors, self excluded") {
    import spark.implicits._
    val res = Similarity.bruteTopK(vecs.where($"vec_id" === 0), vecs, k = 2).collect()
    res.map(_.getLong(1)).toSeq shouldBe Seq(1L, 2L) // same-cluster neighbors
    res.map(_.getLong(0)).distinct.toSeq shouldBe Seq(0L)
  }

  test("centroidDistOutliers flags a planted far vector and only it") {
    import spark.implicits._
    // group "a": a tight cluster around +x plus one ANTIPODAL outlier;
    // group "b": a clean cluster (no outliers past the Tukey fence)
    val tight = (0 until 8).map(i => (i.toLong, "a",
      Seq(1f, 0.01f * i, 0f, 0f)))
    val far = Seq((8L, "a", Seq(-1f, 0f, 0f, 0f)))
    val clean = (10 until 18).map(i => (i.toLong, "b",
      Seq(0f, 1f, 0.01f * (i - 10), 0f)))
    val df = (tight ++ far ++ clean).toDF("vec_id", "grp", "embedding")
    val out = Similarity.centroidDistOutliers(df, "grp", "vec_id", "embedding")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.getDouble(4))).toMap
    graft.core.PlanCache.release(spark)
    out("a")._1 shouldBe 9L
    out("a")._2 shouldBe 1L          // exactly the antipodal vector
    out("a")._3 should be > 1.5      // its distance dominates the fence
    out("b") shouldBe ((8L, 0L, out("b")._3)) // clean cluster: no outliers
  }

  test("lshBucketTopK finds the same top-1 as brute force on separated clusters") {
    import spark.implicits._
    val brute = Similarity.bruteTopK(vecs.where($"vec_id" <= 1), vecs, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lsh = Similarity.lshBucketTopK(vecs.where($"vec_id" <= 1), vecs, k = 1,
        dim = 4, tables = 8, bits = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    lsh shouldBe brute
  }

  test("lsh buckets are deterministic across invocations") {
    val b1 = Similarity.lshBuckets(vecs, dim = 4, tables = 2, bits = 4, seed = 42L)
      .select("buckets").collect().map(_.toString).toSeq
    val b2 = Similarity.lshBuckets(vecs, dim = 4, tables = 2, bits = 4, seed = 42L)
      .select("buckets").collect().map(_.toString).toSeq
    b1 shouldBe b2
  }

  test("mmr rerank trades a redundant near-clone for a distinct relevant doc") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // query at 0°; docs 1/2 sit at +10°/+12° (near-clones, most
    // relevant), doc 3 at −40° on the OTHER side of the query — less
    // relevant than the clone but far from pick #1. Plain top-2 takes
    // both clones; MMR's max-sim penalty (sim(2,1)≈1 ≫ sim(3,1)=cos 50°)
    // swaps the clone for doc 3.
    val docs = Seq(
      (1L, Seq(0.985f, 0.174f, 0f)),
      (2L, Seq(0.978f, 0.208f, 0f)),
      (3L, Seq(0.766f, -0.643f, 0f)),
      (4L, Seq(0f, 0f, 1f))
    ).toDF("vec_id", "embedding")
    val q = Array(1f, 0f, 0f)
    val scored = docs.select($"vec_id", $"embedding",
      graft.functions.RoundPortableExpr.r(
        graft.functions.VectorFunctions.cosineDistance($"embedding", typedlit(q)), 4)
        .as("distance"))
    val mmr = Similarity.mmrRerank(scored, k = 2, lambda = 0.6, shortlist = 4)
      .orderBy($"rank").collect().map(r => (r.getLong(0), r.getInt(1)))
    mmr(0)._1 shouldBe 1L // most relevant first
    mmr(1)._1 shouldBe 3L // diversity beats the clone
    // relevance-only ordering would have ranked the clone second
    val brute = Similarity.bruteTopK(
        Seq((99L, Seq(1f, 0f, 0f))).toDF("vec_id", "embedding"), docs, k = 2)
      .orderBy($"distance").collect().map(_.getLong(1))
    brute.toSeq shouldBe Seq(1L, 2L)
  }

  test("rangeSearch returns exactly the neighbors within eps, excluding self") {
    import spark.implicits._
    // angles from the x-axis: 0° (query), 30°, 60°, 90° → cosine
    // distances 0.134, 0.5, 1.0 from the query
    val docs = Seq(
      (0L, Seq(1f, 0f)),
      (1L, Seq(0.866f, 0.5f)),
      (2L, Seq(0.5f, 0.866f)),
      (3L, Seq(0f, 1f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.rangeSearch(docs.where($"vec_id" === 0), docs, eps = 0.6)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    out.map(_._1).toSet shouldBe Set(1L, 2L) // 3L at distance 1.0 excluded
    out.foreach { case (_, d) => d should be <= 0.6 }
  }

  test("matryoshkaAgreement counts full-vs-prefix top-k overlap per query") {
    import spark.implicits._
    // 4-dim vectors, prefix = first 2 dims. Query along +x. Candidate 1
    // matches on the prefix AND the tail; candidate 2 matches on the
    // prefix but points away in the tail; candidate 3 is orthogonal in
    // the prefix but aligned in the tail. With k=2: full-space top-2 =
    // {1, 3}, prefix-space top-2 = {1, 2} → overlap 1.
    val cands = Seq(
      (1L, Seq(1f, 0f, 1f, 0f)),
      (2L, Seq(1f, 0f, -1f, 0f)),
      (3L, Seq(0f, 0.6f, 5f, 0f))
    ).toDF("vec_id", "embedding")
    val q = Seq((0L, Seq(1f, 0f, 1f, 0f))).toDF("qid", "qe")
    val out = Similarity.matryoshkaAgreement(cands, q, k = 2, prefixDim = 2)
      .collect()
    out.length shouldBe 1
    out.head.getLong(0) shouldBe 0L
    out.head.getLong(1) shouldBe 1L
    out.head.getDouble(2) shouldBe 0.5
  }

  test("bitextMarginPairs mines the planted parallel pair and drops uniform-neighborhood queries") {
    import spark.implicits._
    // side A query 100 has a clear parallel in side B (200); query 101 sits
    // equidistant from every side-B vector -> margin ~= 1, filtered out
    val a = Seq(
      (100L, Array(1f, 0f, 0f, 0f)),
      (101L, Array(0f, 0f, 0f, 1f)),
      (102L, Array(0.9f, 0.1f, 0f, 0f)),
      (103L, Array(0f, 1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val b = Seq(
      (200L, Array(0.99f, 0.05f, 0f, 0f)), // near-duplicate of 100
      (201L, Array(0f, 0.7f, 0.7f, 0f)),
      (202L, Array(0.7f, 0f, 0.7f, 0f)),
      (203L, Array(0.5f, 0.5f, 0.5f, 0f)),
      (204L, Array(0.6f, 0.6f, 0f, 0.2f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.bitextMarginPairs(a.where($"vec_id" <= 101), a, b, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toList
    graft.core.PlanCache.release(spark)
    val m = out.map(t => t._1 -> (t._2, t._3)).toMap
    assert(m.contains(100L) && m(100L)._1 == 200L, s"expected (100 -> 200) in $out")
    assert(m(100L)._2 > 1.0)
    // at most one mined pair per query, margins strictly above 1
    assert(out.map(_._1).distinct.size == out.size)
    assert(out.forall(_._3 > 1.0))
    // 101 is equidistant from every side-B vector (all in its top-4):
    // sim == fwd_avg, so its margin can only clear 1.0 via the backward
    // leg; assert it is NOT mined with a high margin even if present
    out.find(_._1 == 101L).foreach { case (_, _, margin) => assert(margin < m(100L)._2) }
  }

  test("bitext legs keep cross-corpus candidates whose id collides with the query id") {
    import spark.implicits._
    // side A and side B each have a vector keyed 100 — DIFFERENT vectors
    // in different corpora. The kNN legs must not treat the collision as
    // a self-match (r6 advice: bruteTopK's self-exclusion silently
    // dropped it while the SQL oracle kept it).
    val a = Seq((100L, Array(1f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val b = Seq(
      (100L, Array(0.99f, 0.05f, 0f, 0f)), // shares the id, is the true match
      (201L, Array(0f, 1f, 0f, 0f)),
      (202L, Array(0f, 0.7f, 0.7f, 0f))
    ).toDF("vec_id", "embedding")
    val knn = Similarity.bruteTopK(a, b, k = 2, excludeSelf = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    assert(knn.contains((100L, 100L)), s"cross-corpus id collision dropped: $knn")
    // and the default (queries ⊆ candidates) still excludes the self-row
    val self = Similarity.bruteTopK(b, b, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    assert(self.forall { case (q, n) => q != n })
  }

  test("mipsTopK ranks by inner product, not angle") {
    import spark.implicits._
    // vec 11 points the same direction as the query but is LONG; vec 12
    // is angularly closer but short — MIPS must prefer the long one.
    val corpus = Seq(
      (11L, Array(3f, 0f, 0f, 0f)),
      (12L, Array(0.9f, 0.1f, 0f, 0f)),
      (13L, Array(0f, 2f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val q = Seq((1L, Array(1f, 0.05f, 0f, 0f))).toDF("vec_id", "embedding")
    val top = Similarity.mipsTopK(q, corpus, k = 3, excludeSelf = false)
      .collect().map(_.getLong(1)).toSeq
    top shouldBe Seq(11L, 12L, 13L)
  }

  test("MIPS→cosine reduction: augmented-cosine ranking equals ip ranking") {
    import spark.implicits._
    // unnormalized corpus (norms spread 0.5…3) — cosine and MIPS
    // rankings genuinely differ pre-reduction
    val corpus = Seq(
      (0L, Array(3f, 0f, 0f, 0f)), (1L, Array(0.5f, 0.02f, 0f, 0f)),
      (2L, Array(1f, 1f, 0f, 0f)), (3L, Array(0f, 2.5f, 0.5f, 0f)),
      (4L, Array(0.2f, 0.2f, 2f, 0f)), (5L, Array(1.5f, 0f, 1.5f, 0f))
    ).toDF("vec_id", "embedding")
    val queries = Seq(
      (100L, Array(1f, 0.3f, 0f, 0f)),
      (101L, Array(0f, 0.4f, 1f, 0f))
    ).toDF("vec_id", "embedding")
    val exact = Similarity.mipsTopK(queries, corpus, k = 3, excludeSelf = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val maxNorm = 3.1 // ≥ every corpus norm
    val viaCosine = Similarity.bruteTopK(
        Similarity.mipsAugmentQueries(queries, "embedding"),
        Similarity.mipsAugmentCorpus(corpus, "embedding", maxNorm),
        k = 3, excludeSelf = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    viaCosine shouldBe exact
    // sanity: plain cosine over the UNaugmented corpus ranks differently
    val plain = Similarity.bruteTopK(queries, corpus, k = 3, excludeSelf = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    plain should not be exact
  }
}
