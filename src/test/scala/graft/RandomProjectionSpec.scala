package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.functions.{RpProjectExpr, VectorFunctions}

/** JL sign random projection: determinism, dimension contract, and the
  * property that matters — cluster structure survives the projection.
  * The registry audit (`sim_rp_project`) runs on the iid-random fixture
  * where neighbor margins are pure noise; here we build data WITH
  * structure and assert the projection preserves it. */
class RandomProjectionSpec extends SparkSpec with Matchers {

  private def clustered: Seq[(Long, Array[Float])] = {
    // 8 clusters on disjoint 8-dim blocks of a 64-dim space; member m of
    // cluster c = block indicator + small deterministic perturbation.
    // Same-cluster cosine ≈ 1, cross-cluster cosine ≈ 0.
    for (c <- 0 until 8; m <- 0 until 4) yield {
      val v = new Array[Float](64)
      for (d <- 0 until 8) v(c * 8 + d) = 1.0f
      v((c * 8 + m) % 64) += 0.1f * (m + 1)
      ((c * 4 + m).toLong, v)
    }
  }

  test("projection is deterministic and has the contracted dimension") {
    import spark.implicits._
    val df = clustered.toDF("vec_id", "embedding")
    val p1 = df.select($"vec_id", RpProjectExpr.col($"embedding", 64, 16).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val p2 = df.select($"vec_id", RpProjectExpr.col($"embedding", 64, 16).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    p1 shouldBe p2
    p1.values.foreach(_.length shouldBe 16)
  }

  test("dimension mismatch throws") {
    import spark.implicits._
    val bad = Seq((1L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      bad.select(RpProjectExpr.col($"embedding", 64, 16)).collect()
    }
    e.getMessage should include("dimension mismatch")
  }

  test("cluster structure survives 64 -> 16 projection") {
    import spark.implicits._
    val df = clustered.toDF("vec_id", "embedding")
      .withColumn("p", RpProjectExpr.col($"embedding", 64, 16))
      .withColumn("cluster", ($"vec_id" / 4).cast("long"))
    val a = df.select($"vec_id".as("ia"), $"p".as("pa"), $"cluster".as("ca"))
    val b = df.select($"vec_id".as("ib"), $"p".as("pb"), $"cluster".as("cb"))
    val pairs = a.crossJoin(b).where($"ia" < $"ib")
      .select($"ca" === $"cb", VectorFunctions.cosineDistance($"pa", $"pb"))
      .collect().map(r => (r.getBoolean(0), r.getDouble(1)))
    val same = pairs.filter(_._1).map(_._2)
    val cross = pairs.filterNot(_._1).map(_._2)
    // every same-cluster projected distance below every cross-cluster one
    same.max should be < cross.min
  }
}
