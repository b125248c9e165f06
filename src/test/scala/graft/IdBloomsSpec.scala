package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.plans.GvdbRowLevel
import graft.sources.IdBlooms
import graft.table.VectorTable

/** Per-file id Bloom pruning for the CoW victim lookup
  * (sources/IdBlooms.scala): under content-hash ids every file's
  * footer id range spans the keyspace, so range pruning keeps the
  * whole table candidate — the blooms must (1) bootstrap from the
  * first merge's own candidate scan, (2) prune the SECOND lookup to
  * the true maybe-holders with zero false negatives, (3) stay current
  * across later inserts without a rebuild, and (4) survive a
  * whole-table rewrite by invalidation + resync, never by serving
  * stale bits. */
class IdBloomsSpec extends SparkSpec with Matchers {

  private def fs(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** `n` rows with md5-hex ids offset by `salt` — every batch spans
    * the whole hex keyspace, the layout range pruning cannot touch. */
  private def batch(salt: Int, n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val id = java.security.MessageDigest.getInstance("MD5")
        .digest(s"row-$salt-$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
      (id, s"""{"salt":$salt}""", Seq(i.toFloat))
    }.toDF("id", "metadata", "embedding").repartition(2)
  }

  private def groundTruthVictims(root: String, touched: DataFrame): Set[String] = {
    import spark.implicits._
    spark.read.parquet(root)
      .select($"id", input_file_name().as("f"))
      .join(touched, Seq("id"), "left_semi")
      .select($"f").distinct().collect().map(r => new Path(r.getString(0)).getName).toSet
  }

  test("uuid-keyed lookup: bootstrap on first merge, bloom-pruned and sound on the second") {
    val root = Files.createTempDirectory("graft-blooms").toString + "/t"
    val table = new VectorTable(spark, root, 1).create()
    (0 until 4).foreach(s => table.insert(batch(s, 200)))
    val hfs = fs(root)
    IdBlooms.enabled(hfs, root) shouldBe false

    import spark.implicits._
    val touched = batch(2, 200).select($"id").limit(25).distinct().localCheckpoint(true)
    val expected = groundTruthVictims(root, touched)

    // first lookup: full candidate set (ranges overlap), bootstraps the manifest
    val (victims1, _) = GvdbRowLevel.victimLookup(spark, root, touched)
    victims1.map(f => new Path(f).getName).toSet shouldBe expected
    IdBlooms.enabled(hfs, root) shouldBe true
    // every data-carrying file the first pass read now has a valid bloom
    val valid = IdBlooms.validNames(spark, hfs, root)
    assert(expected.subsetOf(valid), "bootstrapped blooms must cover the victims")

    // soundness: a probe may over-approximate (fp) but NEVER misses a
    // file that truly holds a touched id
    val hits = IdBlooms.probe(spark, hfs, root,
      touched.collect().map(_.getString(0)))
    assert(expected.subsetOf(hits), s"false negative: $expected vs $hits")

    // pruning: the touched ids came from ONE insert batch; with 4
    // batches of overlapping ranges the bloom must exclude most files
    // (fpp 0.01 on a handful of files makes a full-keep astronomically
    // unlikely)
    assert(hits.size < valid.size,
      s"bloom probe pruned nothing: ${hits.size} of ${valid.size} files")

    // second lookup goes through the bloom-pruned path: same victims
    val (victims2, _) = GvdbRowLevel.victimLookup(spark, root, touched)
    victims2.map(f => new Path(f).getName).toSet shouldBe expected
  }

  test("inserts keep an existing manifest current; whole-table rewrite invalidates and resyncs") {
    val root = Files.createTempDirectory("graft-blooms2").toString + "/t"
    val table = new VectorTable(spark, root, 1).create()
    (0 until 3).foreach(s => table.insert(batch(s, 150)))
    import spark.implicits._
    val touched = batch(1, 150).select($"id").limit(10).distinct().localCheckpoint(true)
    GvdbRowLevel.victimLookup(spark, root, touched) // bootstrap
    val hfs = fs(root)
    IdBlooms.enabled(hfs, root) shouldBe true

    // an insert after bootstrap: the new files get entries with NO
    // merge in between (the syncIfEnabled hook)
    table.insert(batch(9, 150))
    val validAfterInsert = IdBlooms.validNames(spark, hfs, root)
    // every data-carrying live file is covered — including batch 9's
    val fresh = batch(9, 150).select($"id").limit(5).distinct().localCheckpoint(true)
    val expectedFresh = groundTruthVictims(root, fresh)
    assert(expectedFresh.subsetOf(validAfterInsert),
      "post-bootstrap insert must extend the manifest to its new files")
    IdBlooms.probe(spark, hfs, root, fresh.collect().map(_.getString(0)))
      .intersect(expectedFresh) shouldBe expectedFresh

    // whole-table rewrite (vacuum after a delete): every old entry is
    // stale by (len, mtime); the post-rewrite sync re-covers the new
    // files and GC keeps the manifest from accreting dead rows
    table.delete(get_json_object(col("metadata"), "$.salt") === "0")
    table.vacuum()
    val validAfterRewrite = IdBlooms.validNames(spark, hfs, root)
    val liveAfter = hfs.listStatus(new Path(root))
      .filter(_.getPath.getName.startsWith("part-"))
      .filter(st => graft.sources.GvdbFooters.rowCount(spark, st.getPath.toString) > 0)
      .map(_.getPath.getName).toSet
    liveAfter.subsetOf(validAfterRewrite) shouldBe true
    // correctness across the rewrite: victims for surviving rows
    val touchedAfter = batch(1, 150).select($"id").limit(10).distinct().localCheckpoint(true)
    val (v, _) = GvdbRowLevel.victimLookup(spark, root, touchedAfter)
    v.map(f => new Path(f).getName).toSet shouldBe groundTruthVictims(root, touchedAfter)
  }
}
