package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Expression bridge for graft's custom Catalyst expressions.
  * `classic.ExpressionUtils` is `private[sql]`, so this shim lives in the
  * org.apache.spark.sql package — the standard extension-library pattern.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** RDD id backing an (eagerly) localCheckpoint'ed DataFrame — the EXACT
    * block id to unpersist when the frame is released, with no
    * getPersistentRDDs snapshot diffing (which would misattribute blocks a
    * concurrent driver thread registers in the same window).
    */
  def checkpointedRddId(df: DataFrame): Option[Int] =
    df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }

  /** DataFrame from a logical plan (`Dataset.ofRows` is `private[sql]`). */
  def ofRows(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans
      .logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
