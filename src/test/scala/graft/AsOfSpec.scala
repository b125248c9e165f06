package graft

import org.scalatest.matchers.should.Matchers

import graft.ops.AsOf

class AsOfSpec extends SparkSpec with Matchers {

  test("as-of join picks the latest right row at-or-before each left ts") {
    import spark.implicits._
    val left = Seq((1L, "u1", 100L), (2L, "u1", 250L), (3L, "u2", 50L), (4L, "u3", 10L))
      .toDF("lid", "k", "ts")
    val right = Seq((10L, "u1", 100L), (11L, "u1", 200L), (12L, "u2", 60L))
      .toDF("rid", "k", "ts")
    val out = AsOf.join(left, right, "k", "ts", Seq("rid"))
      .select("lid", "rid_asof")
      .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]))).toMap
    out(1L) shouldBe Some(10L) // tie: equal ts matches (inclusive)
    out(2L) shouldBe Some(11L) // latest of the two earlier rows
    out(3L) shouldBe None      // right row is later than left
    out(4L) shouldBe None      // key with no right rows at all
  }

  test("as-of join agrees with a brute-force evaluator on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val lrows = (0 until 300).map(i => (i.toLong, s"k${rnd.nextInt(10)}", rnd.nextInt(1000).toLong))
    val rrows = (0 until 200).map(i => (1000L + i, s"k${rnd.nextInt(10)}", rnd.nextInt(1000).toLong))
    // make right unique per (key, ts): keep max rid
    val rUnique = rrows.groupBy(r => (r._2, r._3)).map(_._2.maxBy(_._1)).toSeq
    val expected = lrows.map { case (lid, k, ts) =>
      val cands = rUnique.filter(r => r._2 == k && r._3 <= ts)
      lid -> (if (cands.isEmpty) None
              else Some(cands.maxBy(r => (r._3, r._1))._1))
    }.toMap
    val got = AsOf.join(lrows.toDF("lid", "k", "ts"),
        rUnique.toDF("rid", "k", "ts"), "k", "ts", Seq("rid"))
      .select("lid", "rid_asof")
      .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]))).toMap
    got shouldBe expected
  }
}
