package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DoubleType, FloatType}

/** Minimal bridge into `private[sql]` Spark internals, isolated in one
  * place: Column ↔ Expression conversion (the supported internal path in
  * Spark 4's classic API), DataFrame-over-LogicalPlan construction (the
  * MERGE command re-plans its analyzed child plans as DataFrames), and
  * the `AbstractDataType` used by `ExpectsInputTypes`. Lives under
  * `org.apache.spark.sql` solely to satisfy the package-private
  * access — contains no Spark code. */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
  /** The engine's own Catalyst→`sources.Filter` translation — the
    * SupportsDelete acceptance test, asked the way the engine asks. */
  def translateFilter(e: Expression): Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.execution.datasources.DataSourceStrategy
      .translateFilter(e, supportNestedPredicatePushdown = true)
  val floatArrayType: AbstractDataType = ArrayType(FloatType)
  val doubleArrayType: AbstractDataType = ArrayType(DoubleType)
  type AbstractDT = AbstractDataType
}
