package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.matchers.should.Matchers

import graft.ops.Dedup

class DedupSpec extends SparkSpec with Matchers {

  private lazy val docs: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),        // exact dup of 1
      (3L, "the quick brown fox jumps over the lazy cat"),        // near dup of 1
      (4L, "completely different content about spark aggregation engines"),
      (5L, "an unrelated short text")
    ).toDF("doc_id", "text")
  }

  test("exact dedup keeps min id per content hash with counts") {
    val r = Dedup.exact(docs, "text", "doc_id").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    r shouldBe Set((1L, 2L), (3L, 1L), (4L, 1L), (5L, 1L))
  }

  test("jaccard pairs find the near-dup, not unrelated docs") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5, blockCol = None)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain((1L, 2L)) // identical
    pairs should contain((1L, 3L)) // near dup
    pairs should not contain ((1L, 4L))
    pairs should not contain ((4L, 5L))
  }

  test("prefix filtering = unblocked exact jaccard join, boilerplate included") {
    import spark.implicits._
    // 40 docs: 30 share heavy boilerplate with per-doc noise, 5 are a
    // near-dup clique, 5 unrelated — plus a deterministic seeded tail
    // so the prefix order is exercised across many df strata.
    val rnd = new scala.util.Random(42)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val boiler = "terms of service apply to all content provided herein by the operator"
    val base = (1L to 30L).map(i =>
      (i, s"$boiler ${words(rnd.nextInt(8))} ${words(rnd.nextInt(8))} item $i"))
    val clique = (31L to 35L).map(i =>
      (i, s"the quick brown fox jumps over the lazy dog variant ${i % 2}"))
    val other = (36L to 40L).map(i =>
      (i, s"unrelated ${words(rnd.nextInt(8))} content number $i of the corpus ${rnd.nextInt(99)}"))
    val corpus = (base ++ clique ++ other).toDF("doc_id", "text")
    for (t <- Seq(0.5, 0.6, 0.8)) {
      val exact = Dedup.jaccardPairs(corpus, "doc_id", "text", n = 3, threshold = t, blockCol = None)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val pf = Dedup.prefixFilterPairs(corpus, "doc_id", "text", n = 3, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      withClue(s"threshold $t:") { pf shouldBe exact }
    }
  }

  test("minhash LSH finds high-jaccard pairs with exact verification") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
        n = 3, bands = 8, rowsPerBand = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain((1L, 2L))
    pairs should contain((1L, 3L))
    pairs should not contain ((1L, 4L))
    // verified jaccard means no false positives above threshold
    val all = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5, None)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs.subsetOf(all) shouldBe true
  }

  test("simhash: identical docs share signature; near dups are close") {
    val sh = Dedup.simhashes(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    sh(1L) shouldBe sh(2L)
    java.lang.Long.bitCount(sh(1L) ^ sh(3L)) should be < 15
    java.lang.Long.bitCount(sh(1L) ^ sh(4L)) should be > 10
  }

  test("simhash pairs via quarter banding = full pairwise for hamming<=3") {
    val banded = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force reference
    val sh = Dedup.simhashes(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- sh.keys; b <- sh.keys if a < b
      if java.lang.Long.bitCount(sh(a) ^ sh(b)) <= 3
    } yield (a, b)).toSet
    banded shouldBe brute
  }

  test("embedding near-dups by cosine threshold") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(1f, 0f, 0f), 0), (2L, Seq(0.99f, 0.1f, 0f), 0),
      (3L, Seq(0f, 1f, 0f), 0), (4L, Seq(1f, 0f, 0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val pairs = Dedup.embeddingNearDups(emb, "vec_id", "embedding", 0.1, Some("label"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs shouldBe Set((1L, 2L)) // 3 is orthogonal; 4 in another block
  }

  test("hot-bucket cap bounds candidate generation without losing multi-band pairs") {
    import spark.implicits._
    // 30 identical boilerplate docs weld into one giant bucket per band;
    // docs 100/101 are a genuine near-dup pair in their own buckets
    val boiler = (1L to 30L).map(i => (i, "standard legal disclaimer text repeated verbatim"))
    val real = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"),
      (101L, "the quick brown fox jumps over the lazy dog today"))
    val df = (boiler ++ real).toDF("doc_id", "text")
    val capped = Dedup.minhashLshPairs(df, "doc_id", "text",
        n = 3, bands = 8, rowsPerBand = 2, threshold = 0.5, maxBucket = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the 30-doc boilerplate clique (435 pairs) is excluded wholesale...
    assert(!capped.exists { case (a, b) => a <= 30 && b <= 30 })
    // ...while the real pair, living in small buckets, survives
    assert(capped.contains((100L, 101L)))
    // uncapped finds the clique — proving the cap (not the bands) removed it
    val uncapped = Dedup.minhashLshPairs(df, "doc_id", "text",
        n = 3, bands = 8, rowsPerBand = 2, threshold = 0.5,
        maxBucket = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.count { case (a, b) => a <= 30 && b <= 30 } == 435)
    assert((uncapped -- capped).forall { case (a, b) => a <= 30 && b <= 30 })
  }

  test("minhash LSH hot-bucket guard is ON by default (DefaultMaxBucket)") {
    import spark.implicits._
    Dedup.DefaultMaxBucket shouldBe 100
    // A 120-doc verbatim clique exceeds the default cap: its buckets are
    // excluded wholesale by the DEFAULT call, while a small real pair
    // survives — and the explicit exact baseline still finds the clique.
    val boiler = (1L to 120L).toList.map(i => (i, "standard legal disclaimer text repeated verbatim"))
    val real = Seq(
      (1000L, "the quick brown fox jumps over the lazy dog tonight"),
      (1001L, "the quick brown fox jumps over the lazy dog today"))
    val df = (boiler ++ real).toDF("doc_id", "text")
    val default = Dedup.minhashLshPairs(df, "doc_id", "text",
        n = 3, bands = 8, rowsPerBand = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!default.exists { case (a, b) => a <= 120 && b <= 120 })
    assert(default.contains((1000L, 1001L)))
    val exact = Dedup.minhashLshPairs(df, "doc_id", "text",
        n = 3, bands = 8, rowsPerBand = 2, threshold = 0.5,
        maxBucket = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.count { case (a, b) => a <= 120 && b <= 120 } == 120 * 119 / 2)
  }

  test("duplicated substring spans: shared runs found, merged, unique docs absent") {
    import spark.implicits._
    def toks(range: Range, tag: String = "") = range.map(i => s"${tag}w$i").mkString(" ")
    // docs 10/11 share tokens 0..39 (a 40-token verbatim run); doc 12 is
    // same length but token-disjoint; doc 13 is too short to window
    val spanDocs = Seq(
      (10L, toks(0 until 40) + " " + toks(1000 until 1020, "a")),
      (11L, toks(0 until 40) + " " + toks(2000 until 2020, "b")),
      (12L, toks(5000 until 5080, "c")),
      (13L, "tiny doc")
    ).toDF("doc_id", "text")
    val r = Dedup.duplicatedSpans(spanDocs, "doc_id", "text", w = 20, stride = 10)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r.keySet == Set(10L, 11L))
    // shared aligned windows at offsets 0/10/20 merge into ONE span of
    // exactly the 40 shared tokens in each doc
    assert(r(10L)._1 == 1 && r(11L)._1 == 1)
    assert(r(10L)._2 == 40 && r(11L)._2 == 40)
  }

  test("duplicated substring spans: exactly-touching windows merge into one span") {
    import spark.implicits._
    // stride == w → aligned windows at offsets 0 and 5 touch (prev_end ==
    // next off) without overlapping; a contiguous 10-token duplicated run
    // must still report as ONE maximal span, not two
    val shared = (0 until 10).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (20L, shared + " " + (0 until 5).map(i => s"x$i").mkString(" ")),
      (21L, shared + " " + (0 until 5).map(i => s"y$i").mkString(" "))
    ).toDF("doc_id", "text")
    val r = Dedup.duplicatedSpans(docs, "doc_id", "text", w = 5, stride = 5)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r.keySet == Set(20L, 21L))
    assert(r(20L) == ((1L, 10L)) && r(21L) == ((1L, 10L)))
  }

  test("cross-shard near-dups: only incoming-vs-existing pairs are reported") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val existing = Seq(
      (1L, base),          // identical twin INSIDE existing — must not self-pair
      (2L, base),
      (3L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, base),         // duplicates the existing corpus → flagged, j = 1.0
      (11L, "completely different words nothing shared here at all right now")
    ).toDF("doc_id", "text")
    val r = Dedup.crossShardNearDups(existing, incoming, "doc_id", "text",
      n = 3, bands = 8, rowsPerBand = 2, threshold = 0.8).collect()
    core.PlanCache.release(spark)
    r.map(_.getLong(0)).toSet shouldBe Set(10L)
    val hit = r.head
    hit.getAs[Long]("n_matches") shouldBe 2L      // matches BOTH existing twins
    hit.getAs[Double]("best_jaccard") shouldBe 1.0
  }

  test("incremental pairs == full banded pairs restricted to batch-touching") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base), (2L, base),                            // corpus-internal twin pair
      (3L, "one two three four five six seven eight nine ten"),
      (10L, base),                                       // batch doc: twins 1 and 2
      (20L, "one two three four five six seven eight nine ten"), // batch: twins 3
      (30L, base)                                        // batch-internal twin of 10
    ).toDF("doc_id", "text")
    val isBatch = $"doc_id" >= 10L
    val inc = Dedup.minhashIncrementalPairs(docs.where(!isBatch), docs.where(isBatch),
        "doc_id", "text", n = 3, bands = 8, rowsPerBand = 2, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    val full = Dedup.minhashLshPairs(docs, "doc_id", "text",
        n = 3, bands = 8, rowsPerBand = 2, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => a >= 10L || b >= 10L }
    core.PlanCache.release(spark)
    inc.map { case (a, b, _) => (a, b) }.toSet shouldBe full.toSet
    inc.collect { case (a, b, "batch") => (a, b) }.toSet shouldBe Set((10L, 30L))
    inc.collect { case (_, _, "corpus") => () }.size shouldBe inc.size - 1
    full.toSet should not be empty // 5 batch-touching pairs — non-vacuous
  }

  test("jaccardHistogram buckets candidate pairs by decile, identical pair in decile 9") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),   // identical → j = 1.0 → decile 9
      (3L, "alpha beta gamma nine ten eleven"),      // partial overlap with 1/2
      (4L, "unrelated words entirely different here now")
    ).toDF("doc_id", "text")
    val h = Dedup.jaccardHistogram(df, "doc_id", "text", n = 3, blockCol = None)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    h(9) shouldBe 1L                         // the identical pair, capped into decile 9
    h.values.sum shouldBe 3L                 // (1,2), (1,3), (2,3); doc 4 shares nothing
  }
}
