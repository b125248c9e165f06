package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.table.VectorTable

/** The r13 touched-first row-level rewrite (GvdbMergeRule): MERGE /
  * UPDATE / upsert over un-indexed tables evaluate the source↔target
  * id join ONCE against a key-pruned target and feed the group CoW
  * only MUTATED rows, with untouched victim-file rows riding along
  * from the victim files themselves. These tests pin the fast path's
  * results to the semantics the legacy (r12) path had — including the
  * shapes that must fall back to it. */
class RowLevelFastPathSpec extends SparkSpec with Matchers {

  private lazy val warehouse = Files.createTempDirectory("graft-fastpath").toString

  private def init(): Unit = {
    spark.conf.set("spark.sql.catalog.fpc", "graft.sources.GvdbCatalog")
    spark.conf.set("spark.sql.catalog.fpc.warehouse", warehouse)
  }

  private def census(table: String): Map[String, Long] =
    spark.sql(s"SELECT id, CAST(embedding[0] AS bigint) AS v FROM $table")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("fast-path MERGE with an extra ON conjunct: matched-but-filtered rows copy") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS fpc.m1")
    spark.sql("""CREATE TABLE fpc.m1.t
                 (id string, metadata string, embedding array<float>) USING gvdb""")
    import spark.implicits._
    (0 until 10).map(i => (i.toString, "{}", Seq(i.toFloat)))
      .toDF("id", "metadata", "embedding").createOrReplaceTempView("fp_base")
    spark.sql("INSERT INTO fpc.m1.t SELECT * FROM fp_base")
    // changes for ids 5..14, but the extra conjunct drops odd ids from
    // MATCHING (they become both an unmatched target copy AND an
    // unmatched source row → the insert-dedup anti-join must kill the
    // insert: the live copy wins, exactly the legacy semantics)
    (5 until 15).map(i => (i.toString, "{}", Seq((i + 100).toFloat)))
      .toDF("id", "metadata", "embedding").createOrReplaceTempView("fp_chg")
    spark.sql("""MERGE INTO fpc.m1.t t USING fp_chg c
      ON t.id = c.id AND CAST(c.embedding[0] AS int) % 2 = 1
      WHEN MATCHED THEN UPDATE SET embedding = c.embedding
      WHEN NOT MATCHED THEN INSERT (id, metadata, embedding)
        VALUES (c.id, c.metadata, c.embedding)""")
    val got = census("fpc.m1.t")
    // ids 0..4: untouched; 5,7,9: matched+odd → updated (+100);
    // 6,8: matched target but conjunct false → target copy stays, the
    // colliding insert is deduped away; 10..14: true inserts (+100)
    val want = (0 until 5).map(i => i.toString -> i.toLong).toMap ++
      Seq("5", "7", "9").map(s => s -> (s.toLong + 100)).toMap ++
      Seq("6", "8").map(s => s -> s.toLong).toMap ++
      (10 until 15).map(i => i.toString -> (i + 100).toLong).toMap
    got shouldBe want
    spark.sql("DROP TABLE fpc.m1.t")
  }

  test("fast-path MERGE purges a dead raw twin on re-insert (tombstone fold)") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS fpc.m2")
    spark.sql("""CREATE TABLE fpc.m2.t
                 (id string, metadata string, embedding array<float>) USING gvdb""")
    import spark.implicits._
    (0 until 6).map(i => (i.toString, "{}", Seq(i.toFloat)))
      .toDF("id", "metadata", "embedding").createOrReplaceTempView("fp2_base")
    spark.sql("INSERT INTO fpc.m2.t SELECT * FROM fp2_base")
    val tbl = new VectorTable(spark, s"$warehouse/m2/t", 1)
    tbl.delete(col("id") === "3")
    tbl.tombstoneCount shouldBe 1L
    Seq(("3", "{}", Seq(300f)))
      .toDF("id", "metadata", "embedding").createOrReplaceTempView("fp2_chg")
    spark.sql("""MERGE INTO fpc.m2.t t USING fp2_chg c ON t.id = c.id
      WHEN MATCHED THEN UPDATE SET embedding = c.embedding
      WHEN NOT MATCHED THEN INSERT (id, metadata, embedding)
        VALUES (c.id, c.metadata, c.embedding)""")
    // the dead raw '3' was purged with its victim file, its tombstone
    // folded, and the fresh '3' is live
    census("fpc.m2.t") shouldBe Map("0" -> 0L, "1" -> 1L, "2" -> 2L,
      "3" -> 300L, "4" -> 4L, "5" -> 5L)
    tbl.tombstoneCount shouldBe 0L
    spark.sql("SELECT count(*) FROM fpc.m2.t").head.getLong(0) shouldBe 6L
    spark.sql("DROP TABLE fpc.m2.t")
  }

  test("INSERT reassigning ids away from the join key falls back to legacy dedup") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS fpc.m3")
    spark.sql("""CREATE TABLE fpc.m3.t
                 (id string, metadata string, embedding array<float>) USING gvdb""")
    import spark.implicits._
    Seq(("a", "{}", Seq(1f)), ("xb", "{}", Seq(2f)))
      .toDF("id", "metadata", "embedding").createOrReplaceTempView("fp3_base")
    spark.sql("INSERT INTO fpc.m3.t SELECT * FROM fp3_base")
    // source key 'b' is unmatched; the INSERT writes id 'xb', which
    // collides with a LIVE row whose id is NOT among the source keys —
    // only the full-target dedup (legacy path) can see that collision,
    // so the gate must route this merge there: first-wins, 'xb' keeps
    // its original value
    Seq(("b", "{}", Seq(99f)))
      .toDF("id", "metadata", "embedding").createOrReplaceTempView("fp3_chg")
    spark.sql("""MERGE INTO fpc.m3.t t USING fp3_chg c ON t.id = c.id
      WHEN NOT MATCHED THEN INSERT (id, metadata, embedding)
        VALUES (concat('x', c.id), c.metadata, c.embedding)""")
    census("fpc.m3.t") shouldBe Map("a" -> 1L, "xb" -> 2L)
    spark.sql("DROP TABLE fpc.m3.t")
  }

  test("fast-path UPDATE: victim ride-alongs survive, untouched snapshots kept") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS fpc.u1")
    spark.sql("""CREATE TABLE fpc.u1.t
                 (id string, metadata string, embedding array<float>) USING gvdb""")
    import spark.implicits._
    // two insert batches → two file groups
    (0 until 6).map(i => (i.toString, "{}", Seq(i.toFloat)))
      .toDF("id", "metadata", "embedding").createOrReplaceTempView("fpu_b1")
    spark.sql("INSERT INTO fpc.u1.t SELECT * FROM fpu_b1")
    val tbl = new VectorTable(spark, s"$warehouse/u1/t", 1)
    val v1 = tbl.snapshot()
    (6 until 12).map(i => (i.toString, "{}", Seq(i.toFloat)))
      .toDF("id", "metadata", "embedding").createOrReplaceTempView("fpu_b2")
    spark.sql("INSERT INTO fpc.u1.t SELECT * FROM fpu_b2")
    // update touches only batch-2 rows → batch-1 files are no victims →
    // v1 must survive the group CoW (selective expiry)
    spark.sql("UPDATE fpc.u1.t SET embedding = array(CAST(embedding[0] + 100 AS float)) " +
      "WHERE CAST(embedding[0] AS int) >= 8")
    val got = census("fpc.u1.t")
    val want = (0 until 8).map(i => i.toString -> i.toLong).toMap ++
      (8 until 12).map(i => i.toString -> (i + 100).toLong).toMap
    got shouldBe want
    tbl.snapshotVersions should contain(v1)
    spark.sql("DROP TABLE fpc.u1.t")
  }

  test("fast-path upsert: update + insert + deleted-id resurrection in one batch") {
    init()
    import spark.implicits._
    val root = s"$warehouse/up1/t"
    (0 until 5).map(i => (i.toString, "{}", Seq(i.toFloat)))
      .toDF("id", "metadata", "embedding")
      .write.format("gvdb").option("dim", "1").mode("overwrite").save(root)
    val tbl = new VectorTable(spark, root, 1)
    tbl.delete(col("id") === "2")
    // batch: replace 1, resurrect 2, insert 9 — GvdbUpsert.apply is the
    // unit the streaming UPDATE-mode sink calls per epoch (a PATH-based
    // batch `.option("upsert")` write resolves to the V1 provider's
    // plain insert and never reaches it)
    graft.sources.GvdbUpsert(spark, root,
      Seq(("1", "{}", Seq(101f)), ("2", "{}", Seq(202f)), ("9", "{}", Seq(9f)))
        .toDF("id", "metadata", "embedding"), Some(1))
    spark.read.format("gvdb").load(root)
      .select(col("id"), col("embedding")(0).cast("long").as("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap shouldBe
      Map("0" -> 0L, "1" -> 101L, "2" -> 202L, "3" -> 3L, "4" -> 4L, "9" -> 9L)
    tbl.tombstoneCount shouldBe 0L
  }
}
