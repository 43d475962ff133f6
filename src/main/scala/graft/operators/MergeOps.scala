package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot maintenance for a keyed corpus: apply a CDC-style changeset
  * (upserts + deletes) to a base table — the operation a dataset
  * version bump runs between crawls. The reference engine is
  * fit-only (no mutation surface exists in Main.java); this is part of
  * the extension surface a managed 100 TB corpus needs.
  *
  * Scale notes: one full-outer equi-join on the key — sort-merge at
  * corpus scale, broadcast when the changeset is small (AQE decides);
  * with the base and the changeset bucketed by key the join is
  * shuffle-free. No window, no driver state, output is exactly
  * |base ∪ inserts| − |deletes| rows.
  */
object MergeOps {

  /** Merge `changes` into `base` on `key`. `changes` carries the same
    * payload columns as `base` plus `opCol` ∈ {"U","D"}: U rows upsert
    * (update when the key exists, insert when it doesn't; null payload
    * cells keep the base value), D rows delete the key. At most one
    * change row per key. */
  def merge(base: DataFrame, changes: DataFrame, key: String,
            opCol: String): DataFrame = {
    val payload = base.columns.filterNot(_ == key).toSeq
    require(payload.forall(changes.columns.contains),
      s"changes must carry the base payload columns $payload")
    val b = base.select(col(key) +: payload.map(c => col(c).as(s"__b_$c")): _*)
    b.join(changes, Seq(key), "full_outer")
      .filter(col(opCol).isNull || col(opCol) =!= "D")
      .select(col(key) +: payload.map(c =>
        coalesce(col(c), col(s"__b_$c")).as(c)): _*)
  }

  /** Incremental aggregate maintenance (the materialized-view update):
    * fold a NEW batch's pre-aggregated state into the standing per-key
    * aggregate state so the result equals re-aggregating everything —
    * without ever rescanning history. The pattern every warehouse
    * rollup at 100 TB runs: per refresh, cost is O(delta aggregation)
    * + O(state merge), while the naive recompute rescans the full
    * history each time.
    *
    * `measures` maps each state column to its combiner: "sum" (counts
    * and exact sums — the value must already be count/sum-shaped on
    * BOTH sides), "min", or "max". All three are distributive, so the
    * merged state is exactly the state of the unioned inputs under any
    * batching; avg/quantiles must be carried as (sum, n) / sketch
    * components, not merged directly.
    *
    * Scale shape: ONE full-outer equi-join on the grouping keys — both
    * sides are aggregate-sized (keys × measures, not rows); with the
    * state table bucketed on the keys ([[graft.sources.Bucketing]])
    * the join is shuffle-free, and the delta side arrives partially
    * aggregated from its own groupBy. */
  def mergeAggState(state: DataFrame, deltaState: DataFrame,
                    keys: Seq[String],
                    measures: Seq[(String, String)]): DataFrame = {
    require(measures.nonEmpty && measures.forall { case (_, c) =>
      Set("sum", "min", "max")(c) }, s"combiners must be sum|min|max: $measures")
    val cols = keys ++ measures.map(_._1)
    require(cols.forall(state.columns.contains) &&
      cols.forall(deltaState.columns.contains),
      s"state and delta must both carry $cols")
    val b = state.select(keys.map(col) ++
      measures.map { case (c, _) => col(c).as(s"__b_$c") }: _*)
    b.join(deltaState.select(cols.map(col): _*), keys, "full_outer")
      .select(keys.map(col) ++ measures.map { case (c, comb) =>
        val l = col(s"__b_$c")
        val r = col(c)
        (comb match {
          // null-on-one-side = key absent there: take the other side
          // verbatim (preserves the measure's exact type; least/
          // greatest already skip nulls)
          case "sum" => when(l.isNull, r).when(r.isNull, l).otherwise(l + r)
          case "min" => least(l, r)
          case "max" => greatest(l, r)
        }).as(c)
      }: _*)
  }

  /** SCD-2 history merge: like [[merge]], but instead of overwriting,
    * every version survives with a validity interval. `base` carries
    * `valid_from`/`valid_to` (null valid_to = current row); `changes`
    * carries the payload plus `opCol` ∈ {"U","D"}. At `batchTs`: a
    * matched current row is CLOSED (valid_to = batchTs), an upsert
    * opens a new current row, a delete only closes, and closed history
    * rows pass through untouched. The join is a left join of current
    * rows against the (deduplicated) change keys — key-partitioned at
    * scale, broadcast when the changeset is small; history never
    * shuffles at all. */
  def scd2(base: DataFrame, changes: DataFrame, key: String, opCol: String,
           batchTs: Long): DataFrame = {
    require(base.columns.contains("valid_from") &&
      base.columns.contains("valid_to"),
      "scd2 base must carry valid_from/valid_to")
    val payload = base.columns
      .filterNot(c => c == key || c == "valid_from" || c == "valid_to").toSeq
    require(payload.forall(changes.columns.contains),
      s"changes must carry the base payload columns $payload")
    val outCols = (col(key) +: payload.map(col)) :+
      col("valid_from") :+ col("valid_to")
    val history = base.filter(col("valid_to").isNotNull).select(outCols: _*)
    val hit = changes.select(col(key)).distinct().withColumn("__hit", lit(1))
    val currentOut = base.filter(col("valid_to").isNull)
      .join(hit, Seq(key), "left")
      .select((col(key) +: payload.map(col)) :+ col("valid_from") :+
        when(col("__hit").isNotNull, lit(batchTs))
          .otherwise(col("valid_to")).as("valid_to"): _*)
    val opened = changes.filter(col(opCol) =!= "D")
      .select((col(key) +: payload.map(col)) :+
        lit(batchTs).as("valid_from") :+
        lit(null).cast("long").as("valid_to"): _*)
    history.unionByName(currentOut).unionByName(opened)
  }

  /** Snapshot diff — table reconciliation between two keyed
    * snapshots: every key classifies as `added` (only in next),
    * `removed` (only in base) or `changed` (present in both, payload
    * differs null-safely); unchanged keys are dropped, so the output
    * is delta-sized. The audit dual of [[merge]]: merge APPLIES a
    * changeset, diff RECOVERS one from two snapshots (what did the
    * new crawl actually change?).
    *
    * One full-outer join on the key — shuffle both sides by key, or
    * zero exchanges when both snapshots are bucketed on it
    * ([[graft.sources.Bucketing]], the same plan q_bucket_join pins).
    * Payloads compare as a single struct with null-safe equality, so
    * NULL→value and value→NULL both read as changes. Output:
    * (key, status). */
  def snapshotDiff(base: DataFrame, next: DataFrame, keyCol: String,
                   compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "need at least one compare column")
    val b = base.select(col(keyCol).as("key"),
      struct(compareCols.map(col): _*).as("__b"))
    val n = next.select(col(keyCol).as("key"),
      struct(compareCols.map(col): _*).as("__n"))
    b.join(n, Seq("key"), "full_outer")
      .select(col("key"),
        when(col("__b").isNull, "added")
          .when(col("__n").isNull, "removed")
          .when(!(col("__b") <=> col("__n")), "changed")
          .otherwise("unchanged").as("status"))
      .filter(col("status") =!= "unchanged")
  }
}
