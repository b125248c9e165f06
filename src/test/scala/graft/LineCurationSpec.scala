package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.ops.{LineCuration, TextPrimitives}

class LineCurationSpec extends SparkSpec with Matchers {

  test("lineGroups splits words into fixed-width groups, short tail kept") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e"), (2L, "x y"), (3L, "solo")).toDF("doc_id", "text")
    val out = df.select($"doc_id",
        TextPrimitives.lineGroups(TextPrimitives.words($"text"), 2).as("lg"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Seq[String]](1)).toMap
    out(1L) shouldBe Seq(Seq("a", "b"), Seq("c", "d"), Seq("e"))
    out(2L) shouldBe Seq(Seq("x", "y"))
    out(3L) shouldBe Seq(Seq("solo"))
  }

  test("c4LineFilter applies word-count, required and blocklist rules per line") {
    import spark.implicits._
    // lw=3: doc 1 lines: [the cat sat] keep, [on mat x] drop (no 'the'/'a'),
    // [the bad end] drop (blocklist)
    val df = Seq((1L, "the cat sat on mat x the bad end"),
      (2L, "the x y the z w")).toDF("doc_id", "text")
    val out = LineCuration.c4LineFilter(df, "doc_id", "text", lw = 3, minWords = 3,
        required = Seq("the", "a"), blocked = Seq("bad"), minKeptLines = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Int]("n_lines"), r.getAs[Int]("n_kept"), r.getAs[Int]("doc_pass")))).toMap
    out(1L) shouldBe ((3, 1, 0))
    out(2L) shouldBe ((2, 2, 1))
  }

  test("c4LineFilter: zero kept lines hashes the empty string") {
    import spark.implicits._
    val df = Seq((1L, "bad bad bad")).toDF("doc_id", "text")
    val r = LineCuration.c4LineFilter(df, "doc_id", "text", lw = 3, minWords = 3,
      required = Seq("the"), blocked = Seq("bad"), minKeptLines = 1).head()
    r.getAs[Int]("n_kept") shouldBe 0
    r.getAs[String]("cleaned_md5") shouldBe "d41d8cd98f00b204e9800998ecf8427e" // md5("")
  }

  test("boilerplateLineDedup drops lines above the df threshold, keeps order") {
    import spark.implicits._
    // 'nav bar' appears in 3/4 docs (75% > 50%); 'body text'/'unique words' rare.
    val df = Seq(
      (1L, "nav bar body text"),
      (2L, "nav bar unique words"),
      (3L, "nav bar other stuff"),
      (4L, "clean doc here too")).toDF("doc_id", "text")
    val out = LineCuration.boilerplateLineDedup(df, "doc_id", "text", lw = 2, pctDocs = 50)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Int]("n_lines"), r.getAs[Int]("n_kept")))).toMap
    out(1L) shouldBe ((2, 1))
    out(2L) shouldBe ((2, 1))
    out(3L) shouldBe ((2, 1))
    out(4L) shouldBe ((2, 2))
  }

  test("boilerplateLineDedup boundary: df*100 == n_docs*pct keeps the line") {
    import spark.implicits._
    // 'x y' in exactly 2/4 docs = 50%: NOT > 50% → kept everywhere.
    val df = Seq((1L, "x y"), (2L, "x y"), (3L, "p q"), (4L, "r s")).toDF("doc_id", "text")
    val out = LineCuration.boilerplateLineDedup(df, "doc_id", "text", lw = 2, pctDocs = 50)
      .agg(sum($"n_kept")).head().getLong(0)
    out shouldBe 4L
  }

  test("boilerplateLineDedup kept_md5 reassembles surviving lines in position order") {
    import spark.implicits._
    val df = Seq(
      (1L, "keep one nav bar keep two"),
      (2L, "nav bar zz zz"),
      (3L, "nav bar yy yy")).toDF("doc_id", "text")
    val r = LineCuration.boilerplateLineDedup(df, "doc_id", "text", lw = 2, pctDocs = 66)
      .where($"doc_id" === 1).head()
    r.getAs[Int]("n_kept") shouldBe 2
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("keep one\nkeep two".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    r.getAs[String]("kept_md5") shouldBe expected
  }

  test("sim_cluster_balance invariants: caps respected, census consistent") {
    val out = SparkEntry.queries("sim_cluster_balance")(spark, "/root/testdata/sf0.001")
      .collect()
    out.length should be > 1
    out.foreach { r =>
      val (before, kept) = (r.getAs[Int]("n_before"), r.getAs[Int]("n_kept"))
      kept should be <= 8
      kept should be <= before
      kept shouldBe math.min(before, 8)
    }
  }
}
