package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalatest.matchers.should.Matchers

import graft.filters.Filters
import graft.filters.Filters._
import graft.functions.{JsonUuid5, VectorKernels}

/** Property-based coverage (SURVEY.md §5.3-3): randomized inputs from
  * seeded ScalaCheck generators (fixed seeds — reproducible runs, no
  * flakes), checked against mathematical invariants or an independent
  * in-memory evaluator. */
class PropertySpec extends SparkSpec with Matchers {

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, rng.Seed(seed + i)))

  private def arr(xs: Seq[Float]) = new GenericArrayData(xs.toArray)

  test("cosine distance: identity ~0, symmetry, bounds [0,2]") {
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-10f, 10f))
      .suchThat(v => v.exists(_ != 0f))
    val pairs = samples(Gen.zip(vecGen, vecGen), 200, 1L)
    pairs.foreach { case (a, b) =>
      val d = VectorKernels.cosineDistance(arr(a), arr(b))
      d should (be >= -1e-9 and be <= 2.0 + 1e-9)
      VectorKernels.cosineDistance(arr(b), arr(a)) shouldBe d
      VectorKernels.cosineDistance(arr(a), arr(a)) shouldBe 0.0 +- 1e-6
    }
  }

  test("uuid5 content id: deterministic and key-order insensitive") {
    val kvGen = Gen.zip(Gen.identifier.map(_.take(8)), Gen.chooseNum(-1000, 1000))
    val docGen = Gen.listOfN(5, kvGen).map(_.distinctBy(_._1))
    samples(docGen, 200, 2L).foreach { kvs =>
      def json(pairs: Seq[(String, Int)]) =
        pairs.map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}")
      val a = JsonUuid5.jsonUuid5(json(kvs))
      val b = JsonUuid5.jsonUuid5(json(scala.util.Random.javaRandomToRandom(
        new java.util.Random(42)).shuffle(kvs)))
      b shouldBe a
      JsonUuid5.jsonUuid5(json(kvs)) shouldBe a
    }
  }

  test("filter compiler agrees with an independent in-memory evaluator on random ASTs") {
    import spark.implicits._
    // corpus with known paths: {"a": int, "b": {"c": int}, "tags": [str], "s": str}
    case class Doc(id: Int, a: Int, c: Int, tags: Seq[String], s: String)
    val tagPool = Seq("x", "y", "z", "w")
    val docGen = for {
      a <- Gen.chooseNum(0, 20)
      c <- Gen.chooseNum(0, 20)
      tags <- Gen.someOf(tagPool)
      s <- Gen.oneOf("red", "green", "blue")
    } yield (a, c, tags.toSeq, s)
    val docs = samples(docGen, 60, 3L).zipWithIndex.map { case ((a, c, tags, s), i) =>
      Doc(i, a, c, tags, s)
    }
    def toJson(d: Doc) =
      s"""{"id": ${d.id}, "a": ${d.a}, "b": {"c": ${d.c}}, """ +
        s""""tags": [${d.tags.map(t => s""""$t"""").mkString(", ")}], "s": "${d.s}"}"""
    val df = docs.map(d => (d.id, toJson(d))).toDF("id", "metadata")

    val opGen = Gen.oneOf[CmpOp](CmpOp.Gt, CmpOp.Gte, CmpOp.Lt, CmpOp.Lte, CmpOp.Eq, CmpOp.Neq)
    val predGen: Gen[Pred] = Gen.oneOf(
      for { op <- opGen; v <- Gen.chooseNum(0, 20) } yield Cmp("a", op, v),
      for { op <- opGen; v <- Gen.chooseNum(0, 20) } yield Cmp("b.c", op, v),
      Gen.oneOf("red", "green", "blue").map(Eq("s", _)),
      Gen.oneOf(tagPool).map(Contains("tags", _)),
      Gen.someOf(tagPool).map(ts => EqList("tags", ts.toSeq)))
    val filterGen = Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, predGen))

    // independent evaluator over the structured doc (not the JSON text)
    def evalOne(p: Pred, d: Doc): Boolean = p match {
      case Cmp(path, op, v: Int) =>
        val l = if (path == "a") d.a else d.c
        op match {
          case CmpOp.Gt => l > v; case CmpOp.Gte => l >= v
          case CmpOp.Lt => l < v; case CmpOp.Lte => l <= v
          case CmpOp.Eq => l == v; case CmpOp.Neq => l != v
          case other => fail(s"unexpected $other")
        }
      case Eq(_, v) => d.s == v
      case Contains(_, v) => d.tags.contains(v)
      case EqList(_, vs) => d.tags == vs
      case other => fail(s"unexpected $other")
    }

    samples(filterGen, 120, 4L).foreach { preds =>
      val expected = docs.filter(d => preds.forall(evalOne(_, d))).map(_.id).sorted
      val strPath = df.where(Filters.compile(preds, col("metadata")))
        .select("id").collect().map(_.getInt(0)).toSeq.sorted
      val varPath = df.where(Filters.compileVariant(preds, col("metadata")))
        .select("id").collect().map(_.getInt(0)).toSeq.sorted
      withClue(s"preds=$preds: ") {
        strPath shouldBe expected
        varPath shouldBe expected
      }
    }
  }

  test("entropy kernel: bounds, permutation invariance, uniform maximum") {
    import graft.functions.TextEntropyExpr
    import org.apache.spark.unsafe.types.UTF8String
    val kernel = TextEntropyExpr(
      org.apache.spark.sql.graftbridge.GraftBridge.expression(lit("x")))
    val tokGen = Gen.listOfN(30, Gen.oneOf("aa", "bb", "cc", "dd", "ee"))
    samples(tokGen, 150, 7L).foreach { toks =>
      val text = toks.mkString(" ")
      val row = kernel.compute(UTF8String.fromString(text))
      val hTok = row.getDouble(1)
      val distinct = toks.distinct.size
      // 0 <= H <= ln(number of distinct tokens)
      hTok should (be >= 0.0 and be <= math.log(distinct.toDouble) + 1e-9)
      // permutation invariance: entropy depends on the multiset only
      val shuffled = toks.reverse.mkString(" ")
      kernel.compute(UTF8String.fromString(shuffled)).getDouble(1) shouldBe hTok
    }
    // uniform distribution attains the ln(n) maximum
    val uni = kernel.compute(UTF8String.fromString("aa bb cc dd ee"))
    uni.getDouble(1) shouldBe (math.log(5.0) +- 1e-3)
  }

  test("sign projection: linearity and sign flip") {
    import graft.functions.RpProjectExpr
    val kernel = RpProjectExpr(
      org.apache.spark.sql.graftbridge.GraftBridge.expression(lit("x")), 16, 8)
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-5f, 5f))
    samples(vecGen, 150, 8L).foreach { v =>
      val p = kernel.computeProjection(arr(v)).toFloatArray()
      val p2 = kernel.computeProjection(arr(v.map(x => -x))).toFloatArray()
      // P(-v) = -P(v) exactly (sign matrix is linear)
      p.zip(p2).foreach { case (a, b) => (a + b) shouldBe 0.0f }
      // each component bounded by the l1 norm
      val l1 = v.map(math.abs(_)).sum.toDouble
      p.foreach(c => math.abs(c.toDouble) should be <= l1 + 1e-3)
    }
  }

  test("count-min row hashes: in range, deterministic, rows disagree, overflow-free") {
    import spark.implicits._
    import graft.ops.CountMin
    val d = 4
    val w = 256
    val termGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(24))
    val terms = samples(termGen, 200, 9L).distinct
    // run the ACTUAL column expressions on a literal frame for per-term checks
    val df = terms.map(t => Tuple1(t)).toDF("term")
      .select($"term", graft.ops.TextPrimitives.hexLong($"term").as("h"))
      .select($"term", explode(sequence(lit(0L), lit(d - 1L))).as("i"), $"h")
      .selectExpr("term", "i", "h",
        s"(((2 * i + 1) * h + 97 * i + 31) % ${CountMin.P}) % $w AS bucket")
    val rows = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.foreach { case (t, i, h, b) =>
      withClue(s"term=$t i=$i h=$h:") {
        b should (be >= 0L and be < w.toLong)   // in range, no signed overflow
        h should be >= 0L                       // 60-bit base stays non-negative
        // re-derivation in plain scala agrees with the SQL/Column math
        (((2 * i + 1) * h + 97 * i + 31) % CountMin.P) % w shouldBe b
      }
    }
    // the d rows of one term are not all equal for the vast majority of
    // terms (pairwise-independent family actually varies with i)
    val allSame = rows.groupBy(_._1).count { case (_, rs) => rs.map(_._4).distinct.size == 1 }
    allSame.toDouble / terms.size should be < 0.05
  }
}
