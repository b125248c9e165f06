package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.regex.Pattern

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Plain-Scala text/hash kernels backing the dedup + text-analysis
  * expressions.
  *
  * Why kernels and not composed `functions._` columns: Spark's
  * higher-order functions (transform/filter/aggregate) evaluate
  * INTERPRETED, and project-collapsing inlines an aliased `split()`
  * into every lambda use — an O(words²) regex blowup per row (observed:
  * 220 s of CPU for 500 docs). Each kernel runs once per row inside
  * whole-stage codegen via a single generated call.
  *
  * Semantics are pinned to the DuckDB oracle twins in
  * [[graft.ops.TextPrimitives]]: md5-derived 60-bit hashes
  * (`int(md5(s)[0:15], 16)`), `split(lower(text), "\s+")`
  * tokenization, Spark `round` = HALF_UP.
  */
object TextKernels {
  private val ws = Pattern.compile("\\s+")

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  def md5Hex(s: String): String = {
    val d = md5Local.get()
    d.reset()
    val bytes = d.digest(s.getBytes(StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(i * 2) = hexDigits((bytes(i) >> 4) & 0xf)
      out(i * 2 + 1) = hexDigits(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** 60-bit non-negative hash: first 15 hex chars of md5 as a long
    * (oracle twin: CAST(('0x' || substr(md5(s),1,15)) AS BIGINT)). */
  def hexLong(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 15), 16)

  /** Lowercase whitespace tokenization; limit -1 matches Spark `split`. */
  def words(text: String): Array[String] = ws.split(text.toLowerCase, -1)

  /** Distinct word n-gram shingles, first-occurrence order. */
  def shingles(w: Array[String], n: Int): Array[String] = {
    if (w.length < n) return Array.empty
    val seen = new mutable.LinkedHashSet[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= w.length - n) {
      sb.setLength(0)
      var o = 0
      while (o < n) {
        if (o > 0) sb.append(' ')
        sb.append(w(i + o))
        o += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    seen.toArray
  }

  /** 2^61 − 1, the Mersenne prime backing the affine MinHash family. */
  val P61 = 2305843009213693951L

  /** (a · b) mod (2^61 − 1) via a 128-bit intermediate: with
    * x = hi·2^64 + lo, 2^64 ≡ 8 and 2^61 ≡ 1 (mod p), so
    * x ≡ 8·hi + (lo >>> 61) + (lo & p). */
  def mulModP61(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    var s = (hi << 3) + (lo >>> 61) + (lo & P61)
    while (s >= P61) s -= P61
    s
  }

  // Affine-family salts a_i = H("a:i") | 1, b_i = H("b:i"), memoized per k.
  private val saltCache = new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]
  private def salts(k: Int): (Array[Long], Array[Long]) =
    saltCache.computeIfAbsent(k, kk => (
      Array.tabulate(kk)(i => hexLong("a:" + i) | 1L),
      Array.tabulate(kk)(i => hexLong("b:" + i))))

  /** MinHash signature: k minima of the affine family
    * h_i(s) = (a_i · H(s) + b_i) mod (2^61 − 1) — ONE md5 per shingle,
    * k cheap modular derivations (the salted-md5-per-i family costs k
    * md5s per shingle, 16× the hashing for k = 16). */
  def minhashSig(sh: Array[String], k: Int): Array[Long] = {
    val (as, bs) = salts(k)
    val sig = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < sh.length) {
      val h = hexLong(sh(j))
      var i = 0
      while (i < k) {
        var v = mulModP61(as(i), h) + bs(i)
        if (v >= P61) v -= P61
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    sig
  }

  /** LSH band keys: md5 over comma-joined signature slices. */
  def bandKeys(sig: Array[Long], bands: Int, rowsPerBand: Int): Array[String] =
    Array.tabulate(bands) { j =>
      val sb = new java.lang.StringBuilder
      var r = 0
      while (r < rowsPerBand) {
        if (r > 0) sb.append(',')
        sb.append(sig(j * rowsPerBand + r))
        r += 1
      }
      md5Hex(sb.toString)
    }

  /** Winnowing document fingerprints (the MOSS scheme): hash every
    * char k-gram of the lowercased text, slide a window of `w` hashes,
    * keep each window's minimum, return the sorted distinct minima.
    * Guarantees any match of length ≥ k + w − 1 shares a fingerprint,
    * which makes it the localized (substring-level) complement of the
    * whole-document MinHash: near-dup BLOCKS can be found even when the
    * documents as a whole differ. */
  def winnowFingerprints(text: String, k: Int, w: Int): Array[Long] = {
    val t = text.toLowerCase
    val n = t.length - k + 1
    if (n <= 0) return Array.empty
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) { hashes(i) = hexLong(t.substring(i, i + k)); i += 1 }
    val out = new mutable.TreeSet[Long]
    val m = n - w + 1
    if (m <= 0) { out += hashes.min; return out.toArray }
    var j = 0
    while (j < m) {
      var mn = Long.MaxValue
      var r = 0
      while (r < w) { if (hashes(j + r) < mn) mn = hashes(j + r); r += 1 }
      out += mn
      j += 1
    }
    out.toArray
  }

  /** 60-bit SimHash over the word multiset: bit j set iff more than half
    * the words have bit j of their 60-bit hash set. */
  def simhash(w: Array[String], bits: Int = 60): Long = {
    val counts = new Array[Int](bits)
    var i = 0
    while (i < w.length) {
      val h = hexLong(w(i))
      var j = 0
      while (j < bits) {
        if (((h >> j) & 1L) == 1L) counts(j) += 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (counts(j) * 2 > w.length) out |= (1L << j)
      j += 1
    }
    out
  }

}

/** Distinct word n-gram shingles of lowercased text. */
case class ShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[GraftBridge.AbstractDT] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingles"

  def compute(text: UTF8String): ArrayData = {
    val sh = TextKernels.shingles(TextKernels.words(text.toString), n)
    new GenericArrayData(sh.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shinglesExpr", this, classOf[ShinglesExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Sliding character n-grams of lowercased text, CODE-POINT indexed
  * (so the twin `substr` over Unicode characters in DuckDB sees the
  * same windows; bare UTF-16 char slicing would split surrogate
  * pairs). Every position emitted, duplicates kept — Cavnar–Trenkle
  * profiles weight by occurrence count. */
case class CharNgramsExpr(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[GraftBridge.AbstractDT] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_ngrams"

  def compute(text: UTF8String): ArrayData = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    val cps = s.codePoints().toArray
    val m = cps.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      out(i) = UTF8String.fromString(new String(cps, i, n))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charNgramsExpr", this, classOf[CharNgramsExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MinHash signature (array<long>) over a shingle array. */
case class MinHashSigExpr(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[GraftBridge.AbstractDT] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  def compute(arr: ArrayData): ArrayData = {
    val sh = new Array[String](arr.numElements())
    var i = 0
    while (i < sh.length) { sh(i) = arr.getUTF8String(i).toString; i += 1 }
    new GenericArrayData(TextKernels.minhashSig(sh, k))
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashExpr", this, classOf[MinHashSigExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** LSH band keys (array<string> md5s) over a MinHash signature. */
case class BandKeysExpr(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[GraftBridge.AbstractDT] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "band_keys"

  def compute(arr: ArrayData): ArrayData = {
    val keys = TextKernels.bandKeys(arr.toLongArray(), bands, rowsPerBand)
    new GenericArrayData(keys.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bandKeysExpr", this, classOf[BandKeysExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 60-bit SimHash of lowercased text. */
case class SimhashExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[GraftBridge.AbstractDT] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash"

  def compute(text: UTF8String): Long =
    TextKernels.simhash(TextKernels.words(text.toString))

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhashExpr", this, classOf[SimhashExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Winnowing fingerprints (sorted distinct window-min k-gram hashes). */
case class WinnowExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[GraftBridge.AbstractDT] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fingerprints"

  def compute(text: UTF8String): ArrayData =
    new GenericArrayData(TextKernels.winnowFingerprints(text.toString, k, w))

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowExpr", this, classOf[WinnowExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Unicode NFC normalization + control-character strip — the cleanup
  * pass every text pipeline runs before hashing/dedup (decomposed
  * accents hash differently from their composed forms, so un-normalized
  * corpora under-deduplicate). Codegen kernel like the hash family;
  * oracle twin: DuckDB `nfc_normalize` + `regexp_replace`. */
case class NfcNormalizeExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[GraftBridge.AbstractDT] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  def compute(text: UTF8String): UTF8String = {
    val nfc = java.text.Normalizer.normalize(text.toString, java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(nfc.length)
    var i = 0
    while (i < nfc.length) {
      val ch = nfc.charAt(i)
      // strip C0/C1 controls except \t \n \r (mirrors [\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f])
      val isControl = (ch < ' ' && ch != '\t' && ch != '\n' && ch != '\r') ||
        (ch >= '\u007f' && ch <= '\u009f')
      if (!isControl) sb.append(ch)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nfcExpr", this, classOf[NfcNormalizeExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextExprs {
  def nfcNormalize(c: Column): Column =
    GraftBridge.column(NfcNormalizeExpr(GraftBridge.expression(c)))
  def shingles(c: Column, n: Int): Column =
    GraftBridge.column(ShinglesExpr(GraftBridge.expression(c), n))
  def charNgrams(c: Column, n: Int): Column =
    GraftBridge.column(CharNgramsExpr(GraftBridge.expression(c), n))
  def winnow(c: Column, k: Int, w: Int): Column =
    GraftBridge.column(WinnowExpr(GraftBridge.expression(c), k, w))
  def minhashSig(c: Column, k: Int): Column =
    GraftBridge.column(MinHashSigExpr(GraftBridge.expression(c), k))
  def bandKeys(c: Column, bands: Int, rowsPerBand: Int): Column =
    GraftBridge.column(BandKeysExpr(GraftBridge.expression(c), bands, rowsPerBand))
  def simhash(c: Column): Column =
    GraftBridge.column(SimhashExpr(GraftBridge.expression(c)))
}
