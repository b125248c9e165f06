package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.filters.Filters
import graft.filters.Filters._

/** Branch coverage of the filter compiler — every branch of the
  * reference's format_filters (duckvdb.py:63-101) and
  * build_where_clause (utils.py:33-60). */
class FiltersSpec extends SparkSpec with Matchers {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      """{"id": 1, "species": "Seed", "type": ["Grass", "Poison"], "base": {"Attack": 49, "HP": 45}, "tags": [1, 2, 3]}""",
      """{"id": 2, "species": "Lizard", "type": ["Fire", "Flying"], "base": {"Attack": 84, "HP": 58}, "tags": [4, 5]}""",
      """{"id": 3, "species": "Turtle", "type": ["Water"], "base": {"Attack": 48}, "tags": []}"""
    ).toDF("metadata")
  }

  private def ids(preds: Seq[Pred]): Seq[Long] =
    docs.where(Filters.compile(preds, col("metadata")))
      .select(get_json_object(col("metadata"), "$.id").cast("long"))
      .collect().map(_.getLong(0)).toSeq.sorted

  test("P3 comparison tuple on nested json path") {
    ids(Seq(Cmp("base.Attack", CmpOp.Gt, 50))) shouldBe Seq(2L)
    ids(Seq(Cmp("base.Attack", CmpOp.Gte, 49))) shouldBe Seq(1L, 2L)
    ids(Seq(Cmp("base.Attack", CmpOp.Lt, 49))) shouldBe Seq(3L)
    ids(Seq(Cmp("base.Attack", CmpOp.Lte, 48))) shouldBe Seq(3L)
    ids(Seq(Cmp("base.Attack", CmpOp.Neq, 49))) shouldBe Seq(2L, 3L)
  }

  test("P4 scalar equality shorthand") {
    ids(Seq(Eq("species", "Seed"))) shouldBe Seq(1L)
    ids(Seq(Eq("base.HP", 58))) shouldBe Seq(2L)
  }

  test("P5 whole-list equality (order sensitive)") {
    ids(Seq(EqList("type", Seq("Grass", "Poison")))) shouldBe Seq(1L)
    ids(Seq(EqList("type", Seq("Poison", "Grass")))) shouldBe Seq() // order matters
    ids(Seq(EqList("tags", Seq(4, 5)))) shouldBe Seq(2L)
  }

  test("P6 contains with value-type-driven element type") {
    ids(Seq(Contains("type", "Flying"))) shouldBe Seq(2L)
    ids(Seq(Contains("tags", 3))) shouldBe Seq(1L)
    ids(Seq(Contains("tags", 99))) shouldBe Seq()
  }

  test("P7 conjunction; empty filters = all rows") {
    ids(Seq(Cmp("base.Attack", CmpOp.Gt, 40), Contains("type", "Flying"))) shouldBe Seq(2L)
    ids(Nil) shouldBe Seq(1L, 2L, 3L)
  }

  test("missing json field compares null-false (reference NULL semantics)") {
    ids(Seq(Cmp("base.Speed", CmpOp.Gt, 0))) shouldBe Seq()
  }

  test("P8 plain-column surface: in / between / cmp") {
    import spark.implicits._
    val t = Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)).toDF("k", "s", "v")
    def keep(p: Pred): Seq[Int] =
      t.where(Filters.compile(Seq(p), lit(null))).select("k").collect().map(_.getInt(0)).toSeq.sorted
    keep(ColIn("s", Seq("a", "c"))) shouldBe Seq(1, 3)
    keep(ColBetween("v", 15.0, 30.0)) shouldBe Seq(2, 3)
    keep(ColCmp("v", CmpOp.Gte, 20.0)) shouldBe Seq(2, 3)
    keep(ColCmp("s", CmpOp.Like, "%b%")) shouldBe Seq(2)
  }

  test("fromMap parses the reference's python-dict filter shape") {
    val preds = Filters.fromMap(Map(
      "base.Attack" -> ((">", 50)),
      "type" -> (("contains", "Flying")),
      "species" -> "Lizard"))
    ids(preds) shouldBe Seq(2L)
  }

  test("unknown operator rejected (closed set, no SQL splicing)") {
    intercept[IllegalArgumentException](CmpOp.parse("; DROP TABLE items"))
  }

  test("variant fast path agrees with the string path on every predicate shape") {
    val predSets: Seq[Seq[Pred]] = Seq(
      Seq(Cmp("base.Attack", CmpOp.Gt, 50)),
      Seq(Cmp("base.Attack", CmpOp.Lte, 49), Cmp("base.HP", CmpOp.Gte, 45)),
      Seq(Eq("species", "Lizard")),
      Seq(EqList("type", Seq("Grass", "Poison"))),
      Seq(Contains("type", "Flying")),
      Seq(Contains("tags", 2)),
      Seq(Cmp("base.Attack", CmpOp.Gt, 40), Contains("type", "Water")),
      Nil)
    predSets.foreach { preds =>
      val s = docs.where(Filters.compile(preds, col("metadata")))
        .select(get_json_object(col("metadata"), "$.id").cast("long"))
        .collect().map(_.getLong(0)).toSeq.sorted
      val v = docs.where(Filters.compileVariant(preds, col("metadata")))
        .select(get_json_object(col("metadata"), "$.id").cast("long"))
        .collect().map(_.getLong(0)).toSeq.sorted
      withClue(s"preds=$preds: ") { v shouldBe s }
    }
  }
}
