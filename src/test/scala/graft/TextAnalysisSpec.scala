package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.ops.TextAnalysis
import graft.ops.TextPrimitives

class TextAnalysisSpec extends SparkSpec with Matchers {

  private def profile1(text: String) = {
    import spark.implicits._
    TextAnalysis.profile(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text").head()
  }

  test("language id picks the language with most stopword hits") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat is in the house and it is warm"),
      (2L, "der hund ist nicht in das haus und die katze"),
      (3L, "le chat est dans la maison et les oiseaux"),
      (4L, "el perro es un animal y los gatos para la casa"),
      (5L, "xyzzy plugh qwerty")).toDF("doc_id", "text")
    val out = TextAnalysis.profile(df, "doc_id", "text")
      .select("doc_id", "pred_lang").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out shouldBe Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "es", 5L -> "und")
  }

  test("token counts: whitespace and bpe-ish") {
    val r = profile1("Hello, world! 42 times")
    r.getAs[Long]("ws_tokens") shouldBe 4L
    // hello , world ! 4 2 times -> 7
    r.getAs[Long]("bpe_tokens") shouldBe 7L
  }

  test("fingerprint is word-order and duplication invariant") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha alpha")).toDF("doc_id", "text")
    val fps = TextAnalysis.profile(df, "doc_id", "text").select("fingerprint")
      .collect().map(_.getString(0))
    fps(0) shouldBe fps(1)
  }

  test("quality score bounded in (0, 1]") {
    val r = profile1("the data pipeline processes a batch of documents for training and it is fast")
    val q = r.getAs[Double]("quality")
    q should be > 0.0
    q should be <= 1.0
  }

  test("winnowing: shared substring of length >= k+w-1 shares a fingerprint") {
    import graft.functions.TextKernels.winnowFingerprints
    val passage = "the quick brown fox jumps over the lazy dog"
    val a = winnowFingerprints("AAA " + passage + " BBB", 8, 4)
    val b = winnowFingerprints("CCCCC " + passage + " DDDD", 8, 4)
    a.intersect(b).length should be > 0
    // determinism + sorted distinct output
    winnowFingerprints(passage, 8, 4) shouldBe winnowFingerprints(passage, 8, 4)
    val f = winnowFingerprints(passage, 8, 4)
    f.toSeq shouldBe f.toSeq.sorted
    f.toSeq.distinct shouldBe f.toSeq
    // degenerate inputs
    winnowFingerprints("short", 8, 4) shouldBe Array.empty[Long]
    winnowFingerprints("exactly8", 8, 4).length shouldBe 1
  }

  test("nfc normalize composes decomposed accents and strips controls, keeps tab/nl/cr") {
    import spark.implicits._
    val in = Seq("cafe\u0301 x", "a\u0000b\u0007c", "t\tn\nr\rdone", "plain").toDF("s")
    val out = in.select(graft.functions.TextExprs.nfcNormalize(col("s")).as("n"))
      .as[String].collect()
    out(0) shouldBe "caf\u00e9 x" // e + combining acute composes to U+00E9
    out(1) shouldBe "abc"
    out(2) shouldBe "t\tn\nr\rdone"
    out(3) shouldBe "plain"
    // interpreted path (eval without codegen) agrees
    graft.functions.NfcNormalizeExpr(
        org.apache.spark.sql.catalyst.expressions.Literal.create("cafe\u0301",
          org.apache.spark.sql.types.StringType))
      .eval(null).toString shouldBe "caf\u00e9"
  }

  test("hexLong is non-negative 60-bit and matches the duckdb formula") {
    import graft.functions.TextKernels
    val hs = Seq("a", "b", "the quick fox").map(TextKernels.hexLong)
    all(hs) should be >= 0L
    all(hs) should be < (1L << 60)
    // duckdb: CAST(('0x' || substr(md5('hello'),1,15)) AS BIGINT) = 419982666956583591
    TextKernels.hexLong("hello") shouldBe 419982666956583591L
  }

  test("shingles: distinct n-grams; short docs give empty array") {
    import spark.implicits._
    import graft.functions.TextExprs
    val sh = Seq("a b c d", "a b").toDF("t")
      .select(TextExprs.shingles(col("t"), 3).as("sh"))
      .collect().map(_.getSeq[String](0))
    sh(0) shouldBe Seq("a b c", "b c d")
    sh(1) shouldBe Seq.empty
  }

  test("gopher quality rules fire individually on constructed violations") {
    import spark.implicits._
    val good = (("the fox and dog ran " * 12).trim, 1L)     // 60 words, 2 stops
    val short = ("the fox and dog ran", 2L)                 // 5 words → r_words
    val longWords = (Seq.fill(60)("superlonginvention").mkString(" "), 3L) // mean len 18 → r_wlen
    // '####' tokens keep mean word len ≥ 3 so only symbol+alpha rules trip
    val symbols = ((("#### " * 30) + "the fox and dog ran " * 6).trim, 4L)
    // 4-char numeric tokens keep mean word len ≥ 3 so only alpha trips
    val numeric = ((("4242 " * 40) + "the fox and dog ran " * 4).trim, 5L)
    val noStops = (("fox dog cat bird fish " * 12).trim, 6L)               // 0 stops → r_stop
    val df = Seq(good, short, longWords, symbols, numeric, noStops).toDF("text", "doc_id")
    val r = graft.ops.TextAnalysis.gopherQuality(df, "doc_id", "text")
      .collect().map(x => x.getAs[Long]("doc_id") ->
        Seq("r_words", "r_wlen", "r_symbol", "r_alpha", "r_stop").map(x.getAs[Boolean])).toMap
    r(1L) shouldBe Seq(true, true, true, true, true)
    r(2L) shouldBe Seq(false, true, true, true, true)
    r(3L) shouldBe Seq(true, false, true, true, false)
    r(4L) shouldBe Seq(true, true, false, false, true)
    r(5L) shouldBe Seq(true, true, true, false, true)
    r(6L) shouldBe Seq(true, true, true, true, false)
  }

  test("decontaminate: a cap above every df equals the uncapped result; cap 0 flags nothing") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def run(maxDf: Option[Int]) =
      TextAnalysis.decontaminate(docs, "doc_id", "text",
        isBench = col("doc_id") % 10 === 0, maxDf = maxDf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val uncapped = run(None)
    uncapped should not be empty
    run(Some(Int.MaxValue)) shouldBe uncapped // guard is pure prefilter
    run(Some(0)) shouldBe empty               // everything is "boilerplate"
    core.PlanCache.release(spark)
  }

  test("decontaminate boilerplate guard is ON by default (DefaultMaxDf = 200)") {
    import org.apache.spark.sql.functions.col
    TextAnalysis.DefaultMaxDf shouldBe 200
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def run(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the default call (no maxDf arg) equals the explicit cap-200 run
    val default = run(TextAnalysis.decontaminate(docs, "doc_id", "text",
      isBench = col("doc_id") % 10 === 0))
    default shouldBe run(TextAnalysis.decontaminate(docs, "doc_id", "text",
      isBench = col("doc_id") % 10 === 0, maxDf = Some(200)))
    core.PlanCache.release(spark)
  }

  test("evalContamination matches a brute-force n-gram overlap audit") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rows = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val n = 8
    def grams(s: String): Set[String] =
      graft.functions.TextKernels.shingles(graft.functions.TextKernels.words(s), n).toSet
    val all = rows.map { case (id, s) => id -> grams(s) }
    val df = all.values.flatten.groupBy(identity).map { case (g, o) =>
      g -> all.count(_._2.contains(g)) }
    def expected(cap: Option[Int]): Set[(Long, Long, Long)] = {
      val kept: String => Boolean = g => cap.forall(c => df(g) <= c)
      val bench = all.filter(_._1 % 10 == 0)
      val train = all.filter(_._1 % 10 != 0)
      bench.flatMap { case (bid, bg) =>
        val bk = bg.filter(kept)
        val dirty = train.filter { case (_, tg) => tg.exists(g => kept(g) && bk(g)) }
        val shared = train.iterator.flatMap(_._2.filter(g => kept(g) && bk(g))).toSet
        if (dirty.isEmpty) None
        else Some((bid, dirty.size.toLong, shared.size.toLong))
      }.toSet
    }
    def run(cap: Option[Int]) =
      TextAnalysis.evalContamination(docs, "doc_id", "text",
        isBench = col("doc_id") % 10 === 0, n = n, maxDf = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val uncapped = run(None)
    uncapped should not be empty
    uncapped shouldBe expected(None)
    run(Some(3)) shouldBe expected(Some(3))   // cap bites and both sides agree
    core.PlanCache.release(spark)
  }

  test("curriculum buckets partition the corpus and order by quality") {
    val out = SparkEntry.queries("text_curriculum")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    graft.core.PlanCache.release(spark)
    out.keySet shouldBe Set(1, 2, 3, 4)
    val total = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    out.values.map(_._1).sum shouldBe total
    // mean quality decreases down the curriculum; bucket ranges don't overlap
    out(1)._2 should be >= out(2)._2
    out(2)._2 should be >= out(3)._2
    out(3)._2 should be >= out(4)._2
    out(1)._3 should be >= out(2)._4 // min of bucket 1 ≥ max of bucket 2
    out(3)._3 should be >= out(4)._4
  }

  test("gopher kernel counts code points and folds case locale-independently") {
    import graft.functions.GopherStatsExpr
    import org.apache.spark.sql.graftbridge.GraftBridge
    import org.apache.spark.unsafe.types.UTF8String
    val kernel = GopherStatsExpr(
      GraftBridge.expression(org.apache.spark.sql.functions.lit("x")))
    // "😀😀" is 1 word of 2 code points (4 UTF-16 units); a UTF-16 count
    // would report mean_word_len 3.0 over the 3 words instead of 7/3
    val row = kernel.compute(UTF8String.fromString("ab 😀😀 cde"))
    row.getLong(0) shouldBe 3L               // n_words
    row.getDouble(1) shouldBe (7.0 / 3) +- 1e-4 // mean_word_len in code points
    // Locale pitfall: under tr_TR the default toLowerCase maps 'I' → 'ı'
    // (dotless), so "THE" would miss the stop list; Locale.ROOT keeps
    // 'I' → 'i' to match DuckDB's locale-independent lower()
    val turk = kernel.compute(UTF8String.fromString("THE FOX"))
    turk.getLong(4) shouldBe 1L              // "the" recognized as stop word
  }

  test("vocab fit is deterministic and oov rates are exact fractions") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // "common" appears 6×, "shared" 4×; rare words once each. V=2 →
    // vocab = {common, shared}; doc 3 is fully OOV.
    val docs = Seq(
      (1L, "g1", "common common shared rare1"),
      (2L, "g1", "common common shared shared rare2 rare3"),
      (3L, "g2", "unseen words only here"),
      (4L, "g2", "common common shared")
    ).toDF("doc_id", "grp", "text")
    val out = TextAnalysis.vocabOov(docs, "doc_id", "grp", "text", vocabSize = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getAs[Double]("avg_oov"), r.getAs[Double]("max_oov"))).toMap
    core.PlanCache.release(spark)
    out("g1")._1 shouldBe 2L
    out("g1")._2 shouldBe ((0.25 + 2.0 / 6) / 2 +- 1e-4)
    out("g1")._3 shouldBe (2.0 / 6 +- 1e-4)
    out("g2")._1 shouldBe 2L
    out("g2")._3 shouldBe 1.0 // doc 3: every token OOV
  }

  test("entropy kernel: repetition scores low, diverse text high, code points count once") {
    import spark.implicits._
    import graft.functions.TextEntropyExpr
    val df = Seq(
      (1L, "aaaa aaaa aaaa aaaa"),              // repetition: low char AND token entropy
      (2L, "the quick brown fox jumps over it"), // diverse: high both
      (3L, "Qx7Zp9Kf3Lm2Vb8Rt4Ww Qx7Zp9Kf3Lm2Vb8Rt4Ww") // blob twice: high char, LOW token
    ).toDF("doc_id", "text")
    val e = df.select($"doc_id", TextEntropyExpr.col($"text").as("e"))
      .select($"doc_id", $"e.h_char", $"e.h_token")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    e(1L)._1 should be < e(2L)._1   // char entropy: repetition < diverse
    e(1L)._2 shouldBe 0.0           // one distinct token
    e(3L)._1 should be > e(1L)._1   // blob chars are diverse
    e(3L)._2 shouldBe 0.0           // but its token distribution collapsed
    // astral code points count once each (not as surrogate pairs):
    // 4 distinct emoji, uniform -> ln 4
    val emoji = Seq((9L, "🎉🚀🌍🎯")).toDF("doc_id", "text")
    val he = emoji.select(TextEntropyExpr.col($"text").as("e")).select($"e.h_char")
      .head().getDouble(0)
    he shouldBe (math.log(4.0) +- 1e-3)
  }

  test("curation funnel counts are monotonically non-increasing") {
    val r = SparkEntry.queries("pipeline_curation")(spark, "/root/testdata/sf0.001").head()
    core.PlanCache.release(spark)
    val Seq(total, quality, exact, clean, sel) =
      Seq("n_total", "n_quality", "n_exact", "n_clean", "n_selected").map(r.getAs[Long])
    total should be >= quality
    quality should be >= exact
    exact should be >= clean
    clean should be >= sel
    sel should be <= 20L
  }

  test("dsir ranks target-vocabulary documents above raw-vocabulary ones") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // target domain speaks {alpha beta gamma}; the bulk corpus speaks
    // {delta epsilon zeta}. Held-out doc 10 uses target vocabulary, doc
    // 11 bulk vocabulary — DSIR must select 10 first.
    val docs = (
      (1L to 4L).map(i => (i, "alpha beta gamma alpha beta", "tgt")) ++
      (5L to 9L).map(i => (i, "delta epsilon zeta delta epsilon", "raw")) ++
      Seq((10L, "alpha gamma beta gamma", "raw"), (11L, "zeta delta epsilon zeta", "raw"))
    ).toDF("doc_id", "text", "domain")
    val top = TextAnalysis.dsirScores(docs, "doc_id", "text",
      isTarget = col("domain") === "tgt", buckets = 32, topK = 5).collect()
    core.PlanCache.release(spark)
    val ids = top.map(_.getLong(0)).toSet
    // the 4 target docs and the target-vocab held-out doc fill the top 5
    ids should contain(10L)
    (ids should not).contain(11L)
    // scores descend
    val scores = top.map(_.getAs[Double]("dsir_score"))
    scores.sliding(2).foreach { case Array(a, b) => a should be >= b }
  }

  test("char n-grams: sliding, lowercased, duplicates kept, short text empty") {
    import spark.implicits._
    val out = Seq("ABAB", "xy", "").toDF("t")
      .select(graft.functions.TextExprs.charNgrams(col("t"), 3).as("g"))
      .collect().map(_.getSeq[String](0))
    out(0) shouldBe Seq("aba", "bab")
    out(1) shouldBe Seq.empty
    out(2) shouldBe Seq.empty
  }

  test("trained langid: distinct character distributions classify perfectly, disjoint text is und") {
    import spark.implicits._
    // language "aa" writes with {a,b}, "zz" with {y,z}; doc 100/101 are
    // held out; doc 102's alphabet appears in no profile → und
    val docs = (
      (1L to 8L).map(i => (i, "aa", "abba abab baba")) ++
      (9L to 16L).map(i => (i, "zz", "zyyz zyzy yzzy")) ++
      Seq((100L, "aa", "abab abba"), (101L, "zz", "yzyz zzyy"),
        (102L, "aa", "qqqq qqqq"))
    ).toDF("doc_id", "lang", "text")
    val census = TextAnalysis.langIdNgram(docs, "doc_id", "lang", "text",
        isTrain = col("doc_id") < 100, topM = 20)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    core.PlanCache.release(spark)
    census shouldBe Map(("aa", "aa") -> 1L, ("zz", "zz") -> 1L, ("aa", "und") -> 1L)
  }
}
