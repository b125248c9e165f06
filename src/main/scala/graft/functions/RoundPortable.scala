package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Cast, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Engine-portable double rounding, bit-compatible with DuckDB/C++
  * `std::round(x * 10^s) / 10^s` (half away from zero on the BINARY
  * value of the product).
  *
  * Spark's builtin `round` instead does `BigDecimal.valueOf(x)` — i.e.
  * HALF_UP on the SHORTEST DECIMAL REPR of x — so a value whose binary
  * form is 0.6012499999…? but prints as "0.60125" rounds UP in Spark and
  * DOWN in DuckDB. One such boundary value appeared per ~5k docs in the
  * quality-score distribution; every rounded double that feeds the
  * differential oracle goes through this expression instead.
  */
object PortableRounding {
  def round(x: Double, scale: Int): Double = {
    if (x.isNaN || x.isInfinite) return x
    val p = math.pow(10, scale)
    val y = x * p
    // exact half-away-from-zero on y (std::round semantics, no fp +0.5)
    new JBigDecimal(y).setScale(0, RoundingMode.HALF_UP).doubleValue() / p
  }
}

case class RoundPortableExpr(child: Expression, scale: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[GraftBridge.AbstractDT] = Seq(DoubleType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "round_portable"

  def compute(x: Double): Double = PortableRounding.round(x, scale)

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("roundExpr", this, classOf[RoundPortableExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object RoundPortableExpr {
  /** duckdb-compatible round(col, scale) over doubles. */
  def r(c: Column, scale: Int): Column =
    GraftBridge.column(RoundPortableExpr(Cast(GraftBridge.expression(c), DoubleType), scale))
}
