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

/** Per-call SQL-conf isolation for iterative DataFrame algorithms.
  *
  * An iterative loop over NODE-sized state wants a few shuffle
  * partitions, not the session's corpus-tuned width — but mutating
  * `spark.sql.shuffle.partitions` on the shared session races every
  * concurrent query (they'd silently plan at the loop's width). The
  * supported isolation is a CLONED session: same SparkContext, shared
  * cache manager (persisted inputs stay warm), inherited conf and
  * registered functions, but its OWN SQLConf — the loop re-roots its
  * plans into the clone, runs at the loop width, and hands the final
  * plan back re-rooted into the caller's session. Both hooks are
  * `private[sql]` in Spark (`cloneSession`, `Dataset.ofRows`), hence
  * this bridge. */
object SessionBridge {
  /** Clone `s` (conf, UDFs, temp views all inherited; SparkContext and
    * cache shared) and apply `kv` overrides to the clone only. */
  def cloneWithConf(s: org.apache.spark.sql.SparkSession,
                    kv: (String, String)*): org.apache.spark.sql.SparkSession = {
    val c = s.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()
    kv.foreach { case (k, v) => c.conf.set(k, v) }
    c
  }

  /** Rebind `df`'s logical plan to session `to` — planning (and conf
    * reads) then happen under `to`'s SQLConf. The plan itself is
    * session-agnostic; cached/checkpointed inputs resolve through the
    * shared context. */
  def reRoot(df: org.apache.spark.sql.DataFrame,
             to: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      to.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.logical)
}
