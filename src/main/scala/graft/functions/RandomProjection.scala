package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Johnson–Lindenstrauss sign random projection (Achlioptas 2003's
  * ±1 database-friendly variant): `p_j = Σ_i v_i · s_ij` with
  * `s_ij = ±1` derived from the shared md5 base hash
  * (`H("rp:i:j") mod 2` — see [[graft.ops.TextPrimitives.hexLongSql]]),
  * so the projection matrix is a pure function of (i, j): no stored
  * model, identical on every executor, every engine, every rerun. The
  * scale rationale: a 64→16 projection cuts brute-force kNN flops and
  * candidate-scan bytes 4× while JL keeps relative distances within
  * O(√(ln n / outDim)) distortion — the standard cheap pre-filter in
  * front of an exact rerank.
  *
  * One codegen'd kernel pass per row; accumulation in index order in
  * DOUBLE, each output rounded to FLOAT — bit-identical to the DuckDB
  * twin's `list_sum(list_transform(...))::REAL`. */
case class RpProjectExpr(child: Expression, inDim: Int, outDim: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[GraftBridge.AbstractDT] = Seq(GraftBridge.floatArrayType)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rp_project"

  /** signs(j)(i) ∈ {+1.0, −1.0}; built once per JVM from the md5 hash. */
  @transient private lazy val signs: Array[Array[Double]] =
    Array.tabulate(outDim) { j =>
      Array.tabulate(inDim) { i =>
        if (TextKernels.hexLong(s"rp:$i:$j") % 2 == 0) 1.0 else -1.0
      }
    }

  def computeProjection(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n != inDim) {
      throw new IllegalArgumentException(s"rp_project: dimension mismatch ($n vs $inDim)")
    }
    val v = arr.toFloatArray()
    val out = new Array[Float](outDim)
    var j = 0
    while (j < outDim) {
      val s = signs(j)
      var acc = 0.0
      var i = 0
      while (i < inDim) { acc += v(i).toDouble * s(i); i += 1 }
      out(j) = acc.toFloat
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = computeProjection(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rpExpr", this, classOf[RpProjectExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.computeProjection($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RpProjectExpr {
  def col(c: Column, inDim: Int, outDim: Int): Column =
    GraftBridge.column(RpProjectExpr(GraftBridge.expression(c), inDim, outDim))

  /** DuckDB twin of the projection, over a FLOAT[] column expression. */
  def sql(emb: String, inDim: Int, outDim: Int): String = {
    val hex = graft.ops.TextPrimitives.hexLongSql("'rp:' || CAST(i AS VARCHAR) || ':' || CAST(j AS VARCHAR)")
    s"list_transform(range($outDim), j -> CAST(list_sum(list_transform(range($inDim), " +
      s"i -> CASE WHEN $hex % 2 = 0 THEN CAST($emb[i + 1] AS DOUBLE) " +
      s"ELSE -CAST($emb[i + 1] AS DOUBLE) END)) AS REAL))"
  }
}
