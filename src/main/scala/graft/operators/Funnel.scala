package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis over an event log: how many users
  * performed step 1, then step 2 strictly after it, then step 3 after
  * that — the standard product-analytics query shape (and a sequence
  * pattern the reference's single aggregation dataflow cannot express,
  * SURVEY.md §2 "absent categories").
  *
  * Scale shape: ONE shuffle total. All stage timestamps are cumulative
  * conditional window minimums over the SAME (partitionBy user,
  * orderBy ts) spec — Catalyst plans the chained Window operators over
  * a single Exchange+Sort, each stage adding one more running column to
  * the same sorted pass. The naive formulation (per-step self-joins:
  * step-i events ⋈ stage-(i-1) completion times) costs one shuffle per
  * step and re-materializes the event log each time; the window form
  * scans each user's history once regardless of funnel length. The
  * per-user stage frame then collapses by ONE more partial-aggregated
  * global count — no driver-side iteration anywhere. */
object Funnel {

  /** Per-user stage-completion times: for each step i, the earliest
    * `tsCol` of a `stepCol == steps(i)` event STRICTLY after the user's
    * stage-(i-1) completion (stage 0 = beginning of time). Output: one
    * row per user seen in any step, columns `t1..tN` (null = stage not
    * reached). `orderCol` breaks timestamp ties deterministically. */
  def stageTimes(events: DataFrame, userCol: String, stepCol: String,
                 tsCol: String, orderCol: String,
                 steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // running earliest completion of each stage: t_i(row) = min ts of
    // step-i events at-or-before row whose ts is strictly after the
    // running t_{i-1} AT THAT EVENT'S OWN ROW. Ordering by ts makes
    // "strictly after the running previous stage" equal "strictly
    // after the user's final previous-stage time" (the running min
    // over a prefix of a ts-ordered scan is the global min once the
    // prior stage has completed at all).
    val staged = steps.zipWithIndex.foldLeft(events) { case (df, (step, i)) =>
      val hit =
        if (i == 0) when(col(stepCol) === step, col(tsCol))
        else when(col(stepCol) === step &&
          col(tsCol) > col(s"__t$i"), col(tsCol))
      df.withColumn(s"__t${i + 1}", min(hit).over(w))
    }
    // running mins are non-increasing per user: the per-user final
    // value is the plain min — a partial-aggregated groupBy
    staged.groupBy(col(userCol))
      .agg(min(col("__t1")).as("t1"),
        steps.indices.tail.map(i => min(col(s"__t${i + 1}")).as(s"t${i + 1}")): _*)
  }

  /** The funnel report: one row per step with the user count that
    * reached it and the conversion rate vs step 1. */
  def funnel(events: DataFrame, userCol: String, stepCol: String,
             tsCol: String, orderCol: String, steps: Seq[String],
             round6: Column => Column): DataFrame = {
    val stages = stageTimes(events, userCol, stepCol, tsCol, orderCol, steps)
    val counts = stages.agg(
      count(col("t1")).as("n1"),
      steps.indices.tail.map(i => count(col(s"t${i + 1}")).as(s"n${i + 1}")): _*)
    // tiny (1 row × N steps) → long form driver-free via stack, the
    // step-1 denominator rides along as a plain column
    counts.select(expr(
        s"stack(${steps.length}, " +
          steps.indices.map(i => s"${i + 1}, '${steps(i)}', n${i + 1}")
            .mkString(", ") + ") AS (step, step_name, n_users)"),
        col("n1"))
      .select(col("step"), col("step_name"), col("n_users"),
        round6(col("n_users").cast("double") / col("n1")).as("conv_rate"))
  }
}
