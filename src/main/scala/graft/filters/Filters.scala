package graft.filters

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Like => CatalystLike}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._

/** The reference's filter mini-language, re-expressed as a closed AST
  * compiled to Catalyst `Column`s (SURVEY.md §2.2).
  *
  * Two surfaces, matching the reference:
  *  - JSON-path predicates over the schemaless `metadata` column
  *    (`format_filters`, duckvdb.py:63-101): dotted paths, comparison
  *    tuples, scalar/list equality, `contains` on JSON arrays, AND-joined.
  *  - Plain-column predicates (`build_where_clause`, utils.py:11-60):
  *    `field__op` suffixes eq/gt/gte/lt/lte/in/between, AND-joined.
  *
  * Deliberate semantic narrowing (SURVEY.md §7.4): the reference
  * interpolates the operator string unvalidated into SQL (duckvdb.py:90-92,
  * SQL-injectable); we accept only the closed `CmpOp` set below.
  */
object Filters {

  sealed trait CmpOp { def apply(l: Column, r: Column): Column }
  object CmpOp {
    case object Gt extends CmpOp { def apply(l: Column, r: Column): Column = l > r }
    case object Gte extends CmpOp { def apply(l: Column, r: Column): Column = l >= r }
    case object Lt extends CmpOp { def apply(l: Column, r: Column): Column = l < r }
    case object Lte extends CmpOp { def apply(l: Column, r: Column): Column = l <= r }
    case object Eq extends CmpOp { def apply(l: Column, r: Column): Column = l === r }
    case object Neq extends CmpOp { def apply(l: Column, r: Column): Column = l =!= r }
    case object Like extends CmpOp {
      def apply(l: Column, r: Column): Column =
        GraftBridge.column(CatalystLike(GraftBridge.expression(l), GraftBridge.expression(r), '\\'))
    }

    /** Operator-string form accepted by the reference's tuple syntax. */
    def parse(op: String): CmpOp = op match {
      case ">" => Gt
      case ">=" => Gte
      case "<" => Lt
      case "<=" => Lte
      case "=" | "==" => Eq
      case "!=" | "<>" => Neq
      case op if op.equalsIgnoreCase("like") => Like
      case other => throw new IllegalArgumentException(s"unsupported filter operator: $other")
    }
  }

  /** One predicate; all predicates in a filter set are AND-joined
    * (duckvdb.py:101, utils.py:58-60; empty set → true, i.e. `1=1`). */
  sealed trait Pred
  /** `{"base.Attack": (">", 50)}` — comparison on a JSON path (P3). */
  case class Cmp(path: String, op: CmpOp, value: Any) extends Pred
  /** `{"species": "Seed Pokémon"}` — scalar equality shorthand (P4). */
  case class Eq(path: String, value: Any) extends Pred
  /** value is a list — whole-JSON-array equality, order-sensitive (P5). */
  case class EqList(path: String, values: Seq[Any]) extends Pred
  /** `{"type": ("contains", "Flying")}` — JSON array membership (P6). */
  case class Contains(path: String, value: Any) extends Pred
  /** utils.py surface: comparison on a plain top-level column. */
  case class ColCmp(field: String, op: CmpOp, value: Any) extends Pred
  /** utils.py surface: `field__in` list membership. */
  case class ColIn(field: String, values: Seq[Any]) extends Pred
  /** utils.py surface: `field__between` inclusive range. */
  case class ColBetween(field: String, lo: Any, hi: Any) extends Pred

  /** Parses the reference's Python-dict filter shape:
    * value = (op, v) tuple → Cmp/Contains; list → EqList; scalar → Eq. */
  def fromMap(filters: Map[String, Any]): Seq[Pred] =
    filters.toSeq.sortBy(_._1).map {
      case (path, (op: String, v)) if op.equalsIgnoreCase("contains") => Contains(path, v)
      case (path, (op: String, vs: Seq[_])) => // ("=", [..]) list equality via tuple
        CmpOp.parse(op) match {
          case CmpOp.Eq => EqList(path, vs)
          case o => Cmp(path, o, vs)
        }
      case (path, (op: String, v)) => Cmp(path, CmpOp.parse(op), v)
      case (path, vs: Seq[_]) => EqList(path, vs)
      case (path, v) => Eq(path, v)
    }

  /** Dotted path → JSONPath (`"base.Attack"` → `"$.base.Attack"`).
    * Split-on-dot exactly as the reference (duckvdb.py:66-70); keys that
    * themselves contain dots are unaddressable, same limitation. */
  private def jsonPath(path: String): String = "$." + path

  private def extract(metadata: Column, path: String): Column =
    get_json_object(metadata, jsonPath(path))

  /** Value-type-driven typing, mirroring format_filters' Python-type
    * dispatch: numbers compare numerically, strings lexically. */
  private def typed(extracted: Column, value: Any): (Column, Column) = value match {
    case _: Int | _: Long | _: Short | _: Byte =>
      (extracted.cast(LongType), lit(value).cast(LongType))
    case _: Double | _: Float =>
      (extracted.cast(DoubleType), lit(value).cast(DoubleType))
    case _: Boolean => (extracted.cast(BooleanType), lit(value))
    case s: String => (extracted, lit(s))
    case other =>
      throw new IllegalArgumentException(s"unsupported filter value: $other (${other.getClass})")
  }

  /** Element type for `contains`, picked from the probe value's type —
    * VARCHAR/INTEGER/DOUBLE with VARCHAR fallback (duckvdb.py:80-89). */
  private def elementType(value: Any): DataType = value match {
    case _: Int | _: Long | _: Short | _: Byte => LongType
    case _: Double | _: Float => DoubleType
    case _ => StringType
  }

  /** Compiles one JSON-path/plain-column predicate against a row with
    * `metadataCol` holding JSON text. */
  def compileOne(p: Pred, metadataCol: Column): Column = p match {
    case Cmp(path, op, v) =>
      val (l, r) = typed(extract(metadataCol, path), v)
      op(l, r)
    case Eq(path, v) =>
      val (l, r) = typed(extract(metadataCol, path), v)
      l === r
    case EqList(path, vs) =>
      val et = if (vs.nonEmpty) elementType(vs.head) else StringType
      val arr = from_json(extract(metadataCol, path), ArrayType(et))
      val litArr = et match {
        case LongType => typedlit(vs.map(v => v.asInstanceOf[Number].longValue()))
        case DoubleType => typedlit(vs.map(v => v.asInstanceOf[Number].doubleValue()))
        case _ => typedlit(vs.map(_.toString))
      }
      arr <=> litArr
    case Contains(path, v) =>
      val et = elementType(v)
      val arr = from_json(extract(metadataCol, path), ArrayType(et))
      val probe = et match {
        case LongType => lit(v.asInstanceOf[Number].longValue())
        case DoubleType => lit(v.asInstanceOf[Number].doubleValue())
        case _ => lit(v.toString)
      }
      array_contains(arr, probe)
    case ColCmp(field, op, v) => op(col(field), lit(v))
    case ColIn(field, vs) => col(field).isin(vs: _*)
    case ColBetween(field, lo, hi) => col(field).between(lit(lo), lit(hi))
  }

  /** AND-fold; empty → `lit(true)` (the reference's `1=1`). */
  def compile(preds: Seq[Pred], metadataCol: Column): Column =
    preds.map(compileOne(_, metadataCol)).reduceOption(_ && _).getOrElse(lit(true))

  // ---- Spark 4 Variant fast path ----

  /** Target Variant extraction type per value type. */
  private def variantType(value: Any): String = value match {
    case _: Int | _: Long | _: Short | _: Byte => "bigint"
    case _: Double | _: Float => "double"
    case _: Boolean => "boolean"
    case _ => "string"
  }

  /** One predicate over an already-parsed VariantType column. */
  def compileOneVariant(p: Pred, v: Column): Column = p match {
    case Cmp(path, op, value) =>
      op(variant_get(v, jsonPath(path), variantType(value)), lit(value))
    case Eq(path, value) =>
      variant_get(v, jsonPath(path), variantType(value)) === lit(value)
    case EqList(path, vs) =>
      val et = if (vs.nonEmpty) elementType(vs.head) else StringType
      val arr = variant_get(v, jsonPath(path), ArrayType(et).catalogString)
      val litArr = et match {
        case LongType => typedlit(vs.map(x => x.asInstanceOf[Number].longValue()))
        case DoubleType => typedlit(vs.map(x => x.asInstanceOf[Number].doubleValue()))
        case _ => typedlit(vs.map(_.toString))
      }
      arr <=> litArr
    case Contains(path, value) =>
      val et = elementType(value)
      val arr = variant_get(v, jsonPath(path), ArrayType(et).catalogString)
      val probe = et match {
        case LongType => lit(value.asInstanceOf[Number].longValue())
        case DoubleType => lit(value.asInstanceOf[Number].doubleValue())
        case _ => lit(value.toString)
      }
      array_contains(arr, probe)
    case other => compileOne(other, lit(null)) // plain-column preds don't touch metadata
  }

  /** Variant-path compile: the JSON text is parsed ONCE per row
    * (`parse_json` → binary Variant; Catalyst subexpression elimination
    * dedups the parse across predicates), then each predicate does a
    * typed `variant_get` — no per-predicate string re-parse, which is
    * what the `get_json_object` path costs. Same semantics as
    * [[compile]]; the `metadata` contract column stays StringType
    * (SURVEY.md §1.2). */
  def compileVariant(preds: Seq[Pred], metadataCol: Column): Column = {
    // try_parse_json, not parse_json: malformed metadata must filter the
    // row out (the string path's get_json_object-returns-null behavior),
    // not fail the query.
    val v = try_parse_json(metadataCol)
    preds.map(compileOneVariant(_, v)).reduceOption(_ && _).getOrElse(lit(true))
  }
}
