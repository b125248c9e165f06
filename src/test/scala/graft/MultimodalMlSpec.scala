package graft

import org.scalatest.matchers.should.Matchers

import graft.ops.{MlAnn, Multimodal, Similarity}

class MultimodalMlSpec extends SparkSpec with Matchers {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("multimodal: decode stub yields fixed-dim features, batch plumbing works") {
    val media = Multimodal.fakeMediaTable(docs)
    val feat = Multimodal.withFeatures(media, featureDim = 8)
    val rows = feat.select("media_id", "features").limit(5).collect()
    rows.length shouldBe 5
    all(rows.map(_.getSeq[Float](1).length)) shouldBe 8
    // deterministic: same input → same features
    val again = Multimodal.withFeatures(media, featureDim = 8)
      .select("media_id", "features").limit(5).collect()
    rows.map(_.toString) shouldBe again.map(_.toString)
  }

  test("multimodal: binary stats match source columns") {
    val stats = Multimodal.binaryStats(Multimodal.fakeMediaTable(docs))
    val r = stats.limit(3).collect()
    all(r.map(_.getAs[Long]("n_bytes"))) should be > 0L
    all(r.map(_.getAs[String]("content_md5").length)) shouldBe 32
  }

  test("multimodal: resize stub rewrites dims and payload size, frame sampling explodes rows") {
    val media = Multimodal.fakeMediaTable(docs.limit(10))
    val resized = Multimodal.resizeStub(media, 64, 48).collect()
    all(resized.map(_.getAs[Int]("width"))) shouldBe 64
    all(resized.map(_.getAs[Int]("height"))) shouldBe 48
    all(resized.map(_.getAs[Array[Byte]]("content").length)) shouldBe 64 * 48 / 64
    val frames = Multimodal.frameSampleStub(media, nFrames = 4)
    frames.count() shouldBe 40
    frames.select("frame_idx").distinct().count() shouldBe 4
    // deterministic (compare frame bytes by content, not identity)
    def key(r: org.apache.spark.sql.Row) =
      s"${r.getLong(0)}/${r.getInt(1)}/${r.getAs[Array[Byte]](2).map("%02x".format(_)).mkString}"
    Multimodal.frameSampleStub(media, 4).collect().map(key).sorted shouldBe
      frames.collect().map(key).sorted
  }

  test("MLlib BRP-LSH ANN finds mostly the same neighbors as brute force") {
    import spark.implicits._
    val queries = emb.where($"vec_id" < 5)
    val brute = Similarity.bruteTopK(queries, emb, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = MlAnn.brpTopK(queries, emb, k = 3, numHashTables = 8, bucketLength = 2.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // high-recall configuration: most exact neighbors recovered
    (brute intersect approx).size.toDouble / brute.size should be >= 0.8
  }

  test("IVF-Flat ANN: full probe equals brute force; partial probe has high recall") {
    import spark.implicits._
    val queries = emb.where($"vec_id" < 5)
    val brute = Similarity.bruteTopK(queries, emb, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // nProbe == nCells searches every cell → must equal brute force
    val full = MlAnn.ivfTopK(queries, emb, k = 3, nCells = 4, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    full shouldBe brute
    val partial = MlAnn.ivfTopK(queries, emb, k = 3, nCells = 8, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (brute intersect partial).size.toDouble / brute.size should be >= 0.8
  }

  test("IVF append: delta rows searchable without refit; equals index-from-union") {
    import spark.implicits._
    val base = emb.where($"vec_id" % 4 =!= 0)
    val delta = emb.where($"vec_id" % 4 === 0)
    val queries = emb.where($"vec_id" < 5)
    val appended = MlAnn.ivfAppend(MlAnn.ivfBuild(base, nCells = 4), delta)
    // full probe of the appended index = brute force over base ∪ delta:
    // every delta row is immediately searchable
    val probed = MlAnn.ivfProbe(appended, queries, k = 3, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteTopK(queries, emb, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    probed shouldBe brute
    // append against a fixed quantizer assigns delta to the same cells a
    // from-scratch assign with those centroids would
    val rebuilt = appended.copy(indexed =
      MlAnn.ivfAppend(appended.copy(indexed = appended.indexed.limit(0)), emb).indexed)
    val viaRebuild = MlAnn.ivfProbe(rebuilt, queries, k = 3, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    viaRebuild shouldBe probed
  }

  test("ml: adaptiveNProbe — exact fallback under the floor, density floor above it") {
    // under the exact floor the probe widens to ALL cells regardless of base
    MlAnn.adaptiveNProbe(n = 500L, nCells = 16, k = 10, baseNProbe = 8) shouldBe 16
    MlAnn.adaptiveNProbe(n = 9999L, nCells = 16, k = 10, baseNProbe = 2) shouldBe 16
    // large corpus: baseNProbe wins (density floor is tiny)
    MlAnn.adaptiveNProbe(n = 1000000L, nCells = 16, k = 10, baseNProbe = 8) shouldBe 8
    // mid corpus where density floor exceeds base: ceil(4*10*64/20000)=1 < 8 → 8;
    // make density bind: k=100, nCells=64, n=20k → ceil(4*100*64/20000)=2 → base 1 loses
    MlAnn.adaptiveNProbe(n = 20000L, nCells = 64, k = 100, baseNProbe = 1) shouldBe 2
    // never exceeds nCells
    MlAnn.adaptiveNProbe(n = 10001L, nCells = 4, k = 1000, baseNProbe = 8) shouldBe 4
  }

  test("ml: ivfProbeAdaptive on a tiny corpus equals brute force (exact fallback)") {
    import spark.implicits._
    val queries = emb.where($"vec_id" < 5)
    val index = MlAnn.ivfBuild(emb, nCells = 4)
    val probed = MlAnn.ivfProbeAdaptive(index, queries, k = 3, baseNProbe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteTopK(queries, emb, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    probed shouldBe brute
  }

  test("multimodal: WAV round-trip — real RIFF encode/decode recovers the PCM formula") {
    val stats = Multimodal.decodeWavStats(Multimodal.wavMediaTable(docs)).limit(10).collect()
    stats.foreach { r =>
      val id = r.getLong(0)
      val (n, rate) = Multimodal.wavParams(id)
      r.getLong(1) shouldBe n.toLong
      r.getInt(2) shouldBe rate
      val samples = (0 until n).map(Multimodal.wavSample(id, _))
      r.getLong(3) shouldBe samples.map(_.toLong).sum
      r.getInt(4) shouldBe samples.map(math.abs).max
    }
  }

  test("multimodal: frame container demux samples every 2nd frame with exact pixel sums") {
    val frames = Multimodal.sampleFrames(Multimodal.videoMediaTable(docs), step = 2)
      .collect().groupBy(_.getLong(0))
    frames.foreach { case (id, rs) =>
      val expected = (0 until Multimodal.frameCount(id)).filter(_ % 2 == 0)
      rs.map(_.getInt(1)).sorted shouldBe expected
      val (w, h) = Multimodal.pngDims(id)
      rs.foreach { r =>
        r.getInt(2) shouldBe w
        r.getInt(3) shouldBe h
        val f = r.getInt(1)
        val sum = (for (x <- 0 until w; y <- 0 until h)
          yield Multimodal.framePixel(id, f, x, y).toLong).sum
        r.getLong(4) shouldBe sum
      }
    }
  }

  test("dHash: identical images collide, gradient survives resize, noise differs") {
    def gray(w: Int, h: Int)(px: (Int, Int) => Int) = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w) img.getRaster.setSample(x, y, 0, px(x, y))
      img
    }
    // smooth horizontal gradient: every dHash bit is "right > left" = 1
    val grad = gray(36, 24)((x, _) => x * 7)
    val gradSmall = gray(9, 8)((x, _) => (x * 36 / 9) * 7) // its nearest-neighbor resize
    Multimodal.dHash(grad) shouldBe Multimodal.dHash(gradSmall) // resize-invariant
    Multimodal.dHash(grad) shouldBe -1L // all 64 bits set
    // reversed gradient: maximal hamming from the forward one
    val rev = gray(36, 24)((x, _) => (35 - x) * 7)
    java.lang.Long.bitCount(Multimodal.dHash(grad) ^ Multimodal.dHash(rev)) shouldBe 64
  }

  test("audio fingerprint: rising energy sets all bits, gain change preserves it") {
    // samples with strictly rising magnitude per band → every bit 1
    val rising = Array.tabulate(64)(i => i * 100)
    Multimodal.audioFingerprint(rising) shouldBe 0x7fffL // 15 bits set
    // halving preserves all band-order relations here
    Multimodal.audioFingerprint(rising.map(_ / 2)) shouldBe 0x7fffL
    // falling magnitude → no bits
    Multimodal.audioFingerprint(rising.reverse) shouldBe 0L
    // negative samples count by magnitude
    Multimodal.audioFingerprint(rising.map(-_)) shouldBe 0x7fffL
  }

  test("MLlib MinHashLSH finds the known near-dup pairs") {
    import spark.implicits._
    val withDup = docs.select($"doc_id", $"text").union(
      docs.select($"doc_id" + 10000, $"text").where($"doc_id" < 5))
    val pairs = MlAnn.minhashLshJoin(withDup, "doc_id", "text", jaccardDistThreshold = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 5).foreach { i => pairs should contain((i.toLong, i + 10000L)) }
  }

  test("filtered IVF probe: predicate prunes before the scan, full probe equals filtered brute") {
    import spark.implicits._
    val queries = emb.where($"vec_id" < 5)
    val index = MlAnn.ivfBuild(emb, nCells = 4, keepCols = Seq("label"))
    // nProbe = nCells degenerates to exact search over the FILTERED corpus
    val probed = MlAnn.ivfProbeFiltered(index, queries, k = 3, nProbe = 4,
        pred = $"label" === 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteTopK(queries, emb.where($"label" === 2), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    probed shouldBe brute
    // pre-filtering: every query still gets k rows, and only allowed ids
    val allowed = emb.where($"label" === 2).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    probed.map(_._2).subsetOf(allowed) shouldBe true
    probed.groupBy(_._1).values.foreach(_.size shouldBe 3)
  }

  test("filtered IVF append preserves kept metadata columns") {
    import spark.implicits._
    val base = emb.where($"vec_id" % 4 =!= 0)
    val delta = emb.where($"vec_id" % 4 === 0)
    val appended = MlAnn.ivfAppend(
      MlAnn.ivfBuild(base, nCells = 4, keepCols = Seq("label")), delta)
    appended.indexed.columns should contain("label")
    // a delta-only row is reachable through the filtered probe
    val queries = emb.where($"vec_id" < 5)
    val probed = MlAnn.ivfProbeFiltered(appended, queries, k = 3, nProbe = 4,
        pred = $"label" === 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteTopK(queries, emb.where($"label" === 2), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    probed shouldBe brute
  }
}
