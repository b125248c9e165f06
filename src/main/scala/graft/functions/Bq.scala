package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._

/** Binary quantization (BQ) of float32 vectors: one SIGN BIT per
  * dimension, packed little-endian into bytes — 32× smaller than
  * float32 (64-dim: 256 B → 8 B). This is the cheapest memory tier a
  * production vector store offers (below full precision and SQ8/PQ):
  * at 100 TB of raw embeddings the packed codes are ~3 TB, small
  * enough to keep the whole corpus scannable from page cache.
  *
  * Search runs as a cascade (each stage touches only the previous
  * stage's shortlist):
  *   1. coarse — symmetric Hamming distance between packed codes
  *      (pure XOR + popcount over bytes, the fastest kernel here);
  *   2. fine — ASYMMETRIC distance: the float32 query against the
  *      candidate's ±1 sign vector (no dequantization table needed —
  *      the reconstruction is just the sign), which recovers most of
  *      the precision Hamming throws away;
  *   3. exact rerank of the surviving shortlist by joining the raw
  *      embeddings back by id (same pattern as [[Sq8Kernels]]).
  *
  * All three kernels are codegen'd expressions so every stage stays
  * inside whole-stage codegen.
  */
object BqKernels {
  /** Pack sign bits: bit i of the output is 1 iff v(i) > 0. Bytes are
    * filled LSB-first; trailing pad bits of the last byte stay 0. */
  def encode(arr: ArrayData): Array[Byte] = {
    val n = arr.numElements()
    val out = new Array[Byte]((n + 7) >> 3)
    var i = 0
    while (i < n) {
      if (arr.getFloat(i) > 0f) out(i >> 3) = (out(i >> 3) | (1 << (i & 7))).toByte
      i += 1
    }
    out
  }

  /** Hamming distance between two packed codes (XOR + popcount). */
  def hamming(a: Array[Byte], b: Array[Byte]): Int = {
    if (a.length != b.length) {
      throw new IllegalArgumentException(
        s"bq_hamming: code length mismatch (${a.length} vs ${b.length})")
    }
    var acc = 0
    var i = 0
    while (i < a.length) {
      acc += Integer.bitCount((a(i) ^ b(i)) & 0xff)
      i += 1
    }
    acc
  }

  /** Asymmetric cosine distance: float32 query vs the ±1 sign vector a
    * packed code reconstructs to. |s| = sqrt(dim) exactly, so the
    * denominator never needs the candidate floats. */
  def signCosineDistance(q: ArrayData, code: Array[Byte]): Double = {
    val n = q.numElements()
    if (code.length != ((n + 7) >> 3)) {
      throw new IllegalArgumentException(
        s"bq_sign_cosine_distance: dim $n does not match code of ${code.length} bytes")
    }
    var dot = 0.0
    var nq = 0.0
    var i = 0
    while (i < n) {
      val x = q.getFloat(i).toDouble
      dot += (if (((code(i >> 3) >> (i & 7)) & 1) == 1) x else -x)
      nq += x * x
      i += 1
    }
    val denom = math.sqrt(nq) * math.sqrt(n.toDouble)
    if (denom == 0.0) 1.0 else 1.0 - dot / denom
  }
}

/** float32 vector → packed sign-bit code (binary, ceil(dim/8) bytes). */
case class BqEncodeExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[GraftBridge.AbstractDT] = Seq(GraftBridge.floatArrayType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bq_encode"
  override def dataType: DataType = BinaryType

  override def nullSafeEval(input: Any): Any =
    BqKernels.encode(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BqKernels.encode($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object BqEncodeExpr {
  def col(c: Column): Column = GraftBridge.column(BqEncodeExpr(GraftBridge.expression(c)))
}

/** Hamming distance between two packed BQ codes. */
case class BqHammingDistance(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[GraftBridge.AbstractDT] = Seq(BinaryType, BinaryType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bq_hamming"
  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    BqKernels.hamming(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.BqKernels.hamming($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object BqHammingDistance {
  def col(a: Column, b: Column): Column =
    GraftBridge.column(BqHammingDistance(GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** Asymmetric cosine distance: float32 query vs packed sign code. */
case class BqSignCosineDistance(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[GraftBridge.AbstractDT] =
    Seq(GraftBridge.floatArrayType, BinaryType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bq_sign_cosine_distance"
  override def dataType: DataType = DoubleType

  override def nullSafeEval(q: Any, code: Any): Any =
    BqKernels.signCosineDistance(q.asInstanceOf[ArrayData], code.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (q, code) => s"graft.functions.BqKernels.signCosineDistance($q, $code)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object BqSignCosineDistance {
  def col(q: Column, code: Column): Column =
    GraftBridge.column(BqSignCosineDistance(GraftBridge.expression(q), GraftBridge.expression(code)))
}
