package graft

import org.scalatest.matchers.should.Matchers

import graft.core.{Iterate, PlanCache}

/** File-lifecycle contract of the reliable-checkpoint round cutter
  * (round-6 review: the localCheckpoint predecessor left truncated
  * lineage and WARN spam; this pins the replacement's behavior —
  * rounds live as FILES, superseded rounds delete them, and the final
  * round's files die with PlanCache.release). */
class IterateSpec extends SparkSpec with Matchers {

  private def ckptRoot: java.io.File = {
    val dir = spark.sparkContext.getCheckpointDir
    dir shouldBe defined // local master: cut() auto-creates one
    // getCheckpointDir is the per-app subdir; files land under it
    new java.io.File(new java.net.URI(dir.get).getPath match {
      case "" => dir.get
      case p => p
    })
  }

  private def rddDirs: Set[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      Option(f.listFiles).map(_.toSeq.flatMap(x => x +: walk(x))).getOrElse(Nil)
    walk(ckptRoot).filter(f => f.isDirectory && f.getName.startsWith("rdd-"))
      .map(_.getName).toSet
  }

  test("cut writes reliable checkpoint files; drop removes a superseded round") {
    import spark.implicits._
    val r1 = Iterate.cut(Seq(1L, 2L, 3L).toDF("id"))
    val after1 = rddDirs
    val rdd1 = Iterate.checkpointRdd(r1)
    rdd1 shouldBe defined
    rdd1.get.getCheckpointFile shouldBe defined // reliable, not local
    after1 should not be empty
    val r2 = Iterate.cut(r1.select(($"id" * 2).as("id"))) // next round, materialized
    r2.collect().map(_.getLong(0)).sorted shouldBe Array(2L, 4L, 6L)
    Iterate.drop(r1) // superseded: its files must go
    val after2 = rddDirs
    (after1 -- after2) should not be empty // r1's rdd-* dir deleted
    // r2 still readable AFTER r1's files are gone (no dangling lineage)
    r2.count() shouldBe 3L
    Iterate.drop(r2)
  }

  test("PlanCache.release deletes a registered final round's checkpoint files") {
    import spark.implicits._
    val fin = Iterate.cut(Seq(10L, 20L).toDF("id"))
    val rdd = Iterate.checkpointRdd(fin).get
    PlanCache.registerRdd(spark, rdd)
    val file = rdd.getCheckpointFile.get
    val path = new java.io.File(new java.net.URI(file).getPath)
    path.exists() shouldBe true
    PlanCache.release(spark)
    path.exists() shouldBe false
  }

  test("zero truncated-lineage exposure: a graph query leaves no checkpoint files after release") {
    val before = rddDirs
    val q = SparkEntry.queries("graph_pagerank")(spark, "/root/testdata/sf0.001")
    q.queryExecution.toRdd.foreach(_ => ())
    PlanCache.release(spark)
    val leaked = rddDirs -- before
    withClue(s"checkpoint dirs left after release: $leaked") {
      leaked shouldBe empty
    }
  }
}
