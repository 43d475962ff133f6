package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column↔Expression converters — the
  * supported extension-point pattern for libraries that add native
  * Catalyst expressions (Spark 4 moved the public `new Column(expr)`
  * constructor behind org.apache.spark.sql.classic.ExpressionUtils). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Storage hygiene for iterative DataFrame algorithms.
  *
  * `Dataset.localCheckpoint()` pins its materialized rows as storage
  * blocks on the RDD behind the returned Dataset's `LogicalRDD` — and
  * `Dataset.unpersist()` does NOT release them (it only talks to the
  * SQL cache manager). An iterative loop that checkpoints every round
  * therefore accumulates one dead block set per superseded iteration
  * until driver GC happens to collect the RDD. This helper releases a
  * superseded checkpoint's blocks eagerly; the caller must guarantee
  * the Dataset is never evaluated again (its lineage is truncated, so
  * recomputation is impossible by design). */
object CheckpointBridge {
  def freeLocalCheckpoint(df: org.apache.spark.sql.Dataset[_]): Unit =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
