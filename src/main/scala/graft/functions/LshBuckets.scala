package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._

/** Sign-random-projection (cosine) LSH bucket ids as a native Catalyst
  * expression: for each of `tables` hash tables, a `bits`-bit bucket id
  * from the signs of `bits` hyperplane projections.
  *
  * The hyperplane matrix is derived deterministically from `seed` via
  * splitmix64 and materialized ONCE per expression instance (driver +
  * each executor deserialization), then referenced from generated code —
  * NOT inlined into the expression tree. (A naive column-expression
  * formulation inlines tables×bits×dim scalar ops and sends janino into
  * quadratic local-variable analysis — minutes of compile for 8×12×64.)
  *
  * Scale: evaluation is O(tables × bits × dim) multiply-adds per row,
  * fully partition-parallel, no shuffle; the bucket ids then drive an
  * equi-join which is the only wide stage of an ANN query.
  */
case class LshBucketsExpr(child: Expression, dim: Int, tables: Int, bits: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {

  require(bits <= 62, "bits must fit in a long")

  override def inputTypes: Seq[GraftBridge.AbstractDT] = Seq(GraftBridge.floatArrayType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_buckets"

  /** planes(t*bits + b)(d) — built lazily on first eval per JVM. */
  @transient private lazy val planes: Array[Array[Float]] = {
    def splitmix(x: Long): Long = {
      var z = x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    Array.tabulate(tables * bits) { tb =>
      Array.tabulate(dim) { d =>
        val z = splitmix(seed + (tb.toLong << 24) + d)
        ((z >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0).toFloat
      }
    }
  }

  def computeBuckets(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n != dim) {
      throw new IllegalArgumentException(s"lsh_buckets: dimension mismatch ($n vs $dim)")
    }
    val v = arr.toFloatArray()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < bits) {
        val plane = planes(t * bits + b)
        var dot = 0.0
        var d = 0
        while (d < dim) { dot += v(d).toDouble * plane(d).toDouble; d += 1 }
        if (dot > 0) bucket |= (1L << b)
        b += 1
      }
      // table index encoded into the id → bucket ids are globally unique
      // across tables, so a flat arrays_overlap is a correct any-table
      // bucket-collision test (used by AnnRewriteRule).
      out(t) = (t.toLong << bits) | bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = computeBuckets(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshExpr", this, classOf[LshBucketsExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.computeBuckets($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshBucketsExpr {
  def apply(c: Column, dim: Int, tables: Int, bits: Int, seed: Long): Column =
    GraftBridge.column(LshBucketsExpr(GraftBridge.expression(c), dim, tables, bits, seed))
}
