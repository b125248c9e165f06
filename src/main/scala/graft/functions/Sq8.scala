package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._

/** Scalar quantization (SQ8) of float32 vectors: each vector is encoded
  * as one byte per dimension against its own [min, max] range —
  * 4× smaller than float32 (64-dim: 256 B → 64 B codes + 8 B range).
  * The per-vector range (vs one global range) keeps the quantization
  * step at (max−min)/255 regardless of outlier vectors elsewhere in the
  * corpus; worst-case per-component error is half a step.
  *
  * [[Sq8CosineDistance]] is the ASYMMETRIC distance (Jégou et al.'s ADC
  * applied to scalar codes): the float32 query against dequantized
  * candidate bytes, one pass over the code — candidates never need
  * their floats resident for the scan, which is the memory story that
  * makes a 100 TB corpus scannable from codes.
  */
object Sq8Kernels {
  /** (code bytes, min, scale) for one vector. scale = max − min; a
    * constant vector (scale 0) encodes to all-zero bytes and
    * dequantizes exactly to min. */
  def encode(arr: ArrayData): GenericInternalRow = {
    val n = arr.numElements()
    var mn = Float.MaxValue
    var mx = Float.MinValue
    var i = 0
    while (i < n) {
      val v = arr.getFloat(i)
      if (v < mn) mn = v
      if (v > mx) mx = v
      i += 1
    }
    if (n == 0) { mn = 0f; mx = 0f }
    val sc = mx - mn
    val inv = if (sc == 0f) 0.0 else 255.0 / sc
    val code = new Array[Byte](n)
    i = 0
    while (i < n) {
      val q = Math.round((arr.getFloat(i) - mn) * inv)
      code(i) = (if (q < 0L) 0L else if (q > 255L) 255L else q).toByte
      i += 1
    }
    new GenericInternalRow(Array[Any](code, mn, sc))
  }

  /** Cosine distance between a float32 query and an SQ8 code,
    * dequantizing on the fly (same widen-then-accumulate order as
    * [[VectorKernels.cosineDistance]] so rerank distances are
    * comparable). */
  def cosineDistance(q: ArrayData, code: Array[Byte], mn: Float, sc: Float): Double = {
    val n = q.numElements()
    if (n != code.length) {
      throw new IllegalArgumentException(
        s"sq8_cosine_distance: dimension mismatch (${n} vs ${code.length})")
    }
    val step = sc.toDouble / 255.0
    val base = mn.toDouble
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = q.getFloat(i).toDouble
      val y = base + (code(i) & 0xff) * step
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 1.0 else 1.0 - dot / denom
  }
}

/** float32 vector → struct(code: binary, mn: float, sc: float). */
case class Sq8EncodeExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[GraftBridge.AbstractDT] = Seq(GraftBridge.floatArrayType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq8_encode"
  override def dataType: DataType = StructType(Seq(
    StructField("code", BinaryType, nullable = false),
    StructField("mn", FloatType, nullable = false),
    StructField("sc", FloatType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    Sq8Kernels.encode(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sq8Kernels.encode($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object Sq8EncodeExpr {
  def col(c: Column): Column = GraftBridge.column(Sq8EncodeExpr(GraftBridge.expression(c)))
}

/** Asymmetric cosine distance: float32 query vs (code, mn, sc). */
case class Sq8CosineDistance(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[GraftBridge.AbstractDT] =
    Seq(GraftBridge.floatArrayType, BinaryType, FloatType, FloatType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq8_cosine_distance"
  override def dataType: DataType = DoubleType

  override def nullSafeEval(q: Any, code: Any, mn: Any, sc: Any): Any =
    Sq8Kernels.cosineDistance(q.asInstanceOf[ArrayData],
      code.asInstanceOf[Array[Byte]], mn.asInstanceOf[Float], sc.asInstanceOf[Float])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (q, code, mn, sc) =>
      s"graft.functions.Sq8Kernels.cosineDistance($q, $code, $mn, $sc)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, o: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = o)
}

object Sq8CosineDistance {
  def col(q: Column, code: Column, mn: Column, sc: Column): Column =
    GraftBridge.column(Sq8CosineDistance(GraftBridge.expression(q),
      GraftBridge.expression(code), GraftBridge.expression(mn), GraftBridge.expression(sc)))
}
