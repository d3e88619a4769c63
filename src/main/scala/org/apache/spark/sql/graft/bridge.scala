package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's custom Catalyst expressions.
  *
  * Spark 4 moved these conversions behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`); libraries that ship
  * their own codegen'd expressions (as graft does with
  * [[graft.functions.PolyHash]]) conventionally expose them through a
  * one-file package bridge like this — the only file in the repo living
  * outside the `graft` namespace, and the only Spark-internal surface it
  * touches.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** InternalRow RDD → DataFrame, for operators whose per-partition fold
    * runs on `queryExecution.toRdd` (the last-resort imperative tier, e.g.
    * [[graft.operators.Skyline.skylineMinPerGroup]]'s frontier fold) and
    * must re-enter the declarative plan without an external-Row round-trip.
    */
  def internalCreateDataFrame(
      spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
