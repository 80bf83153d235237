package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AtomicType, DataType}

/** Thin accessor for `private[sql]` Spark internals the engine needs:
  * Column <-> Expression conversion (Spark 4's Column wraps a ColumnNode, not
  * an Expression) and the AtomicType check. Kept to one file so the
  * semi-internal surface is pinned in a single place (SURVEY §7 risk 1).
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def isAtomic(dt: DataType): Boolean = dt.isInstanceOf[AtomicType]

  /** Wrap a logical plan as a DataFrame (`Dataset.ofRows` is
    * private[sql]) — the entry point for the engine's custom logical
    * nodes (e.g. [[graft.plans.AsOfJoinNode]]). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
