package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Edit-distance / string-similarity kernels Spark lacks as builtins,
  * as codegen'd binary expressions for the fuzzy-linkage verifiers.
  *
  * Semantics are pinned BYTE-FOR-BYTE to the DuckDB oracle builtins
  * (`damerau_levenshtein`, `jaro_winkler_similarity`), which operate
  * over UTF-8 BYTES, not code points (probed: 'héllo'↔'hello' = 2,
  * jaro len('héllo') = 6). For ASCII inputs this equals the usual
  * character-level definition. Double arithmetic in [[jaro]] /
  * [[jaroWinkler]] follows the exact operation order of the oracle —
  * verified bit-identical on 115k random pairs across three alphabets
  * plus the customer-name shape, so round-4 oracle compares can never
  * flip at a boundary.
  *
  * Damerau-Levenshtein is the FULL (unrestricted) distance of
  * Lowrance & Wagner 1975 ("An extension of the string-to-string
  * correction problem", JACM 22(2)) — `CA→ABC = 2`, not the
  * restricted OSA 3. Jaro-Winkler uses the standard p=0.1 prefix
  * scaling above the 0.7 boost threshold (Winkler 1990), with the
  * oracle's convention that any empty side (including both empty)
  * scores 0.0.
  *
  * O(|a|·|b|) time and memory per row — intended for bounded-length
  * keys (names, titles) under a capped blocking pass, not documents.
  */
object StringKernels {

  /** Full Damerau-Levenshtein distance over UTF-8 bytes. */
  def damerau(ua: UTF8String, ub: UTF8String): Int = {
    val a = ua.getBytes
    val b = ub.getBytes
    val la = a.length
    val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val maxd = la + lb
    val w = lb + 2
    val h = new Array[Int]((la + 2) * w)
    var i = 0
    while (i <= la) {
      h((i + 1) * w) = maxd
      h((i + 1) * w + 1) = i
      i += 1
    }
    var j = 0
    while (j <= lb) {
      h(j + 1) = maxd
      h(w + j + 1) = j
      j += 1
    }
    // last row index (1-based) where each byte value occurred in `a`
    val da = new Array[Int](256)
    i = 1
    while (i <= la) {
      var db = 0
      var jj = 1
      while (jj <= lb) {
        val k = da(b(jj - 1) & 0xff)
        val l = db
        var cost = 1
        if (a(i - 1) == b(jj - 1)) { cost = 0; db = jj }
        var best = h(i * w + jj) + cost                        // substitute
        val ins = h((i + 1) * w + jj) + 1                      // insert
        if (ins < best) best = ins
        val del = h(i * w + jj + 1) + 1                        // delete
        if (del < best) best = del
        val tra = h(k * w + l) + (i - k - 1) + 1 + (jj - l - 1) // transpose
        if (tra < best) best = tra
        h((i + 1) * w + jj + 1) = best
        jj += 1
      }
      da(a(i - 1) & 0xff) = i
      i += 1
    }
    h((la + 1) * w + lb + 1)
  }

  /** Jaro similarity over UTF-8 bytes; 0.0 when either side is empty. */
  def jaro(a: Array[Byte], b: Array[Byte]): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    var window = math.max(la, lb) / 2 - 1
    if (window < 0) window = 0
    val am = new Array[Boolean](la)
    val bm = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var matched = false
      while (j <= hi && !matched) {
        if (!bm(j) && a(i) == b(j)) {
          am(i) = true; bm(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var j = 0
    i = 0
    while (i < la) {
      if (am(i)) {
        while (!bm(j)) j += 1
        if (a(i) != b(j)) t += 1
        j += 1
      }
      i += 1
    }
    t /= 2
    // exact oracle operation order — do not refactor
    (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3.0
  }

  /** Threshold-bounded EXACT intersection count of two SORTED distinct
    * string arrays — the set-similarity-join verifier (PPJoin's
    * verification step, Xiao et al. WWW 2008): a two-pointer merge
    * that BAILS with −1 as soon as the achievable overlap
    * (inter so far + min remaining) drops below the Jaccard-equivalent
    * overlap floor α = t/(1+t)·(|a|+|b|). For the dominant near-miss
    * candidates this exits after a fraction of the merge; for true
    * pairs it returns the exact intersection size (arrays are distinct
    * + sorted, so the merge IS set intersection). One codegen'd call
    * per pair — replaces the interpreted array_intersect that
    * dominated the 100× verify stage. */
  def boundedIntersect(a: ArrayData, b: ArrayData, tEff: Double): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    val alpha = tEff / (1 + tEff) * (na + nb)
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      if (inter + math.min(na - i, nb - j) < alpha) return -1
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { inter += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    if (inter.toDouble < alpha) -1 else inter
  }

  /** Jaro-Winkler similarity (p=0.1, boost threshold 0.7, prefix ≤ 4). */
  def jaroWinkler(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.getBytes
    val b = ub.getBytes
    var sim = jaro(a, b)
    if (sim > 0.7) {
      val cap = math.min(4, math.min(a.length, b.length))
      var l = 0
      while (l < cap && a(l) == b(l)) l += 1
      sim = sim + l * 0.1 * (1.0 - sim)
    }
    sim
  }
}

/** Full Damerau-Levenshtein distance (UTF-8 bytes) as an integer. */
case class DamerauLevenshteinExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[GraftBridge.AbstractDT] = Seq(StringType, StringType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "damerau_levenshtein"
  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    StringKernels.damerau(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.StringKernels.damerau($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object DamerauLevenshteinExpr {
  def col(a: Column, b: Column): Column =
    GraftBridge.column(DamerauLevenshteinExpr(GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** Threshold-bounded exact sorted-set intersection count (−1 = below
  * the overlap floor for effective threshold `tEff`). */
case class BoundedIntersectExpr(left: Expression, right: Expression, tEff: Double)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[GraftBridge.AbstractDT] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bounded_intersect"
  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    StringKernels.boundedIntersect(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], tEff)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.StringKernels.boundedIntersect($a, $b, ${tEff}D)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object BoundedIntersectExpr {
  def col(a: Column, b: Column, tEff: Double): Column =
    GraftBridge.column(BoundedIntersectExpr(
      GraftBridge.expression(a), GraftBridge.expression(b), tEff))
}

/** Jaro-Winkler similarity (UTF-8 bytes) as a double in [0, 1]. */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[GraftBridge.AbstractDT] = Seq(StringType, StringType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaro_winkler"
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    StringKernels.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.StringKernels.jaroWinkler($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object JaroWinklerExpr {
  def col(a: Column, b: Column): Column =
    GraftBridge.column(JaroWinklerExpr(GraftBridge.expression(a), GraftBridge.expression(b)))
}
