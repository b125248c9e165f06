package graft

import org.scalatest.matchers.should.Matchers

import graft.functions.{DamerauLevenshteinExpr, JaroWinklerExpr, StringKernels}
import org.apache.spark.unsafe.types.UTF8String

class StringKernelsSpec extends SparkSpec with Matchers {

  private def u(s: String) = UTF8String.fromString(s)

  test("damerau is the FULL Lowrance-Wagner distance, not restricted OSA") {
    // CA→ABC: full DL = 2 (transpose CA→AC, insert B); OSA would say 3
    StringKernels.damerau(u("CA"), u("ABC")) shouldBe 2
    StringKernels.damerau(u("abcde"), u("acbde")) shouldBe 1
    StringKernels.damerau(u("kitten"), u("sitting")) shouldBe 3
    StringKernels.damerau(u(""), u("abc")) shouldBe 3
    StringKernels.damerau(u("abc"), u("")) shouldBe 3
    StringKernels.damerau(u(""), u("")) shouldBe 0
    StringKernels.damerau(u("same"), u("same")) shouldBe 0
  }

  test("damerau operates over UTF-8 bytes (oracle semantics)") {
    // 'é' is 2 bytes → 2 edits vs 1-byte 'e'; 3-byte CJK swap is 4 byte-edits
    StringKernels.damerau(u("héllo"), u("hello")) shouldBe 2
    StringKernels.damerau(u("日本"), u("本日")) shouldBe 4
  }

  test("jaro-winkler matches published vectors bit-for-bit") {
    StringKernels.jaroWinkler(u("martha"), u("marhta")) shouldBe 0.9611111111111111
    StringKernels.jaroWinkler(u("dixon"), u("dicksonx")) shouldBe 0.8133333333333332
    StringKernels.jaroWinkler(u("DWAYNE"), u("DUANE")) shouldBe 0.8400000000000001
    StringKernels.jaroWinkler(u("abc"), u("abc")) shouldBe 1.0
  }

  test("jaro-winkler empty-side convention is the oracle's 0.0 (incl. both empty)") {
    StringKernels.jaroWinkler(u(""), u("")) shouldBe 0.0
    StringKernels.jaroWinkler(u("a"), u("")) shouldBe 0.0
    StringKernels.jaroWinkler(u(""), u("a")) shouldBe 0.0
  }

  test("winkler boost applies only above 0.7 and caps the prefix at 4") {
    // disjoint strings: jaro 0, no boost
    StringKernels.jaroWinkler(u("abc"), u("xyz")) shouldBe 0.0
    // long shared prefix: boost uses at most 4 chars
    val jw = StringKernels.jaroWinkler(u("prefixes"), u("prefixed"))
    val jaro = StringKernels.jaro(u("prefixes").getBytes, u("prefixed").getBytes)
    jw shouldBe (jaro + 4 * 0.1 * (1.0 - jaro))
  }

  test("expressions run inside codegen over a DataFrame") {
    import spark.implicits._
    val df = Seq(("martha", "marhta"), ("CA", "ABC"), ("", ""))
      .toDF("a", "b")
      .select(
        DamerauLevenshteinExpr.col($"a", $"b").as("dl"),
        JaroWinklerExpr.col($"a", $"b").as("jw"))
    val rows = df.collect().map(r => (r.getInt(0), r.getDouble(1)))
    rows(0) shouldBe ((1, 0.9611111111111111))
    rows(1) shouldBe ((2, 0.0))
    rows(2) shouldBe ((0, 0.0))
  }

  test("null inputs propagate null") {
    import spark.implicits._
    val df = Seq((Option("abc"), Option.empty[String]))
      .toDF("a", "b")
      .select(DamerauLevenshteinExpr.col($"a", $"b").as("dl"),
        JaroWinklerExpr.col($"a", $"b").as("jw"))
    val r = df.collect()(0)
    r.isNullAt(0) shouldBe true
    r.isNullAt(1) shouldBe true
  }
}
