package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Deterministic content-hash id for a JSON document: RFC-4122 UUIDv5 of
  * the canonical JSON text (keys sorted), namespaced under DNS — the
  * reference's dedup key (`json_to_uuid`, utils.py:6-9, used at
  * duckvdb.py:50).
  *
  * Canonicalization is bit-compatible with Python
  * `json.dumps(obj, sort_keys=True)`: keys sorted, `", "` / `": "`
  * separators, `ensure_ascii` escaping (`\uXXXX` lowercase, surrogate
  * pairs for astral chars), short escapes for `\b \t \n \f \r " \\`.
  * Caveat (SURVEY.md §7.4): float formatting follows Java shortest-repr,
  * which matches Python repr for common decimals but can diverge in
  * exponent style; id-sensitive tests constrain metadata to
  * str/int/bool/null/array/object values.
  */
object JsonUuid5 {

  /** UUIDv5 DNS namespace, RFC 4122 appendix C. */
  private val NamespaceDns: Array[Byte] = Array(
    0x6b, 0xa7, 0xb8, 0x10, 0x9d, 0xad, 0x11, 0xd1,
    0x80, 0xb4, 0x00, 0xc0, 0x4f, 0xd4, 0x30, 0xc8).map(_.toByte)

  private val mapper = new ObjectMapper()

  /** Parses JSON text and re-serializes it canonically (sorted keys,
    * Python-`json.dumps`-compatible formatting). */
  def canonicalize(json: String): String = {
    val node = mapper.readTree(json)
    val sb = new StringBuilder
    writeNode(node, sb)
    sb.toString
  }

  private def writeNode(node: JsonNode, sb: StringBuilder): Unit = {
    if (node.isObject) {
      sb.append('{')
      val names = node.fieldNames().asScala.toArray.sorted(Ordering.String)
      var first = true
      names.foreach { name =>
        if (!first) sb.append(", ")
        first = false
        writeString(name, sb)
        sb.append(": ")
        writeNode(node.get(name), sb)
      }
      sb.append('}')
    } else if (node.isArray) {
      sb.append('[')
      var first = true
      node.elements().asScala.foreach { el =>
        if (!first) sb.append(", ")
        first = false
        writeNode(el, sb)
      }
      sb.append(']')
    } else if (node.isTextual) {
      writeString(node.textValue(), sb)
    } else if (node.isIntegralNumber) {
      sb.append(node.bigIntegerValue().toString)
    } else if (node.isFloatingPointNumber) {
      sb.append(formatDouble(node.doubleValue()))
    } else if (node.isBoolean) {
      sb.append(if (node.booleanValue()) "true" else "false")
    } else { // null / missing
      sb.append("null")
    }
  }

  /** Python-repr-style double: "1.0" not "1", "1e+20" not "1.0E20". */
  private def formatDouble(d: Double): String = {
    val s = java.lang.Double.toString(d)
    if (s.contains("E")) {
      // Java "1.0E20" / "1.0E-5" → Python "1e+20" / "1e-05"
      val Array(mantissa, exp) = s.split("E")
      val m = if (mantissa.endsWith(".0")) mantissa.dropRight(2) else mantissa
      val expInt = exp.toInt
      val sign = if (expInt < 0) "-" else "+"
      val absExp = math.abs(expInt)
      val expStr = if (absExp < 10) s"0$absExp" else absExp.toString
      s"${m}e$sign$expStr"
    } else s
  }

  /** `ensure_ascii=True` string escaping, matching CPython's
    * json.encoder.py_encode_basestring_ascii. Iterates UTF-16 code units,
    * so astral chars emit surrogate pairs exactly like Python. */
  private def writeString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case c if c >= 0x20 && c < 0x7f => sb.append(c)
        case c => sb.append(f"\\u${c.toInt}%04x")
      }
      i += 1
    }
    sb.append('"')
  }

  /** RFC-4122 UUIDv5 (SHA-1) of `name` under the DNS namespace —
    * bit-exact with Python `uuid.uuid5(uuid.NAMESPACE_DNS, name)`. */
  def uuid5(name: String): String = {
    val md = MessageDigest.getInstance("SHA-1")
    md.update(NamespaceDns)
    md.update(name.getBytes(StandardCharsets.UTF_8))
    val h = md.digest()
    h(6) = ((h(6) & 0x0f) | 0x50).toByte // version 5
    h(8) = ((h(8) & 0x3f) | 0x80).toByte // RFC 4122 variant
    val hex = h.take(16).map(b => f"${b & 0xff}%02x").mkString
    s"${hex.substring(0, 8)}-${hex.substring(8, 12)}-${hex.substring(12, 16)}-" +
      s"${hex.substring(16, 20)}-${hex.substring(20, 32)}"
  }

  /** Content-hash id of a JSON document (canonicalize → uuid5). */
  def jsonUuid5(json: String): String = uuid5(canonicalize(json))

  /** Spark UDF form. Canonical-JSON hashing is inherently string-building
    * + SHA-1, so a codegen Expression buys nothing here — the UDF call
    * overhead is negligible vs the hash itself. */
  val asUdf: UserDefinedFunction = udf((json: String) => jsonUuid5(json))

  def jsonUuid5Col(c: Column): Column = asUdf(c)

  def register(spark: SparkSession): Unit =
    spark.udf.register("json_uuid5", asUdf)
}
