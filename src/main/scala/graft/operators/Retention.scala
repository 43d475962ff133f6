package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention over an event log — the classic product-analytics
  * triangle: each user's cohort is their FIRST active day, and the
  * retention cell (cohort_day, day_offset) counts how many users from
  * that cohort were active exactly `day_offset` days after it. The
  * reference engine has no event-time surface at all (SURVEY.md §0);
  * this extends the events family (q_event_daily, q_sessionize,
  * q_funnel) with the remaining canonical batch-analytics shape.
  *
  * Scale shape — TWO partial-aggregated shuffles, no window sort, no
  * join:
  *
  *  1. `groupBy(user).agg(collect_set(day))` — one shuffle on the user
  *     key. `collect_set` dedupes map-side, so the shuffle carries at
  *     most one entry per (user, active-day) regardless of how many
  *     events a user emits in a day. The per-user state is bounded by
  *     the CALENDAR, not the event volume: a user active every single
  *     day for 10 years is a 3,653-element set. The cohort day is
  *     `array_min` over that set — no second pass, no window.
  *  2. `groupBy(cohort_day, day_offset).agg(count)` — one shuffle of
  *     pre-counted cells; output is at most |days|² / 2 rows.
  *
  * The obvious alternative — distinct (user, day) → `min(day) OVER
  * (PARTITION BY user)` → groupBy — costs a third shuffle (the
  * distinct's (user, day) partitioning doesn't serve the window's
  * user partitioning) and a per-user sort; the fold above gets the
  * same cells from one user-keyed exchange. `count(*)` is exact
  * (not countDistinct) because step 1 already collapsed to one row
  * per (user, day).
  *
  * `dayCol` is an integer day index (e.g. `ts_ms div 86400000`), kept
  * as exact integer arithmetic end to end so the result is
  * bit-identical across engines — no date/timezone casting anywhere. */
object Retention {

  /** Retention cells (cohort_day, day_offset, n_users), day_offset 0
    * (the cohort's own size) through `maxOffset` inclusive. */
  def cohortRetention(events: DataFrame, userCol: String, dayCol: String,
                      maxOffset: Int = Int.MaxValue): DataFrame = {
    require(maxOffset >= 0, "maxOffset must be non-negative")
    events
      .select(col(userCol).as("__user"), col(dayCol).cast("long").as("__day"))
      .groupBy("__user")
      .agg(collect_set(col("__day")).as("__days"))
      .select(array_min(col("__days")).as("cohort_day"),
        explode(col("__days")).as("__day"))
      .select(col("cohort_day"),
        (col("__day") - col("cohort_day")).as("day_offset"))
      .filter(col("day_offset") <= maxOffset)
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /** Exponentially time-decayed activity score per key — the recency
    * weight of freshness-aware sampling ("prefer data from active,
    * recent sources") and of any leaderboard where yesterday matters
    * more than last year. Each event contributes
    * `value · 2^(−(T − ts_ms) / halfLifeMs)` where T is the corpus
    * max event time (one broadcast agg row — the decay horizon must
    * be DATA-derived, or the score depends on wall-clock run time).
    *
    * Per-event contributions round to integer MICROS before the
    * per-key sum — the order-independence discipline every micros
    * pipeline here uses — so the score is an exact long under any
    * partitioning and replays bit-identically in SQL. One shuffle:
    * the per-key partial-agg sum; the horizon row broadcasts.
    * Output: (key, n_events, decay_micros). */
  def decayedScore(events: DataFrame, keyCol: String, tsMsCol: String,
                   valueCol: String, halfLifeMs: Long): DataFrame = {
    require(halfLifeMs > 0, "halfLifeMs must be positive")
    val horizon = events.agg(max(col(tsMsCol)).as("__t_max"))
    val contrib = floor(col(valueCol) *
      pow(lit(2.0), -(col("__t_max") - col(tsMsCol)).cast("double") /
        lit(halfLifeMs.toDouble)) * lit(1e6) + lit(0.5)).cast("long")
    events
      .select(col(keyCol).as("key"), col(tsMsCol), col(valueCol))
      .crossJoin(broadcast(horizon))
      .groupBy("key")
      .agg(count(lit(1)).as("n_events"), sum(contrib).as("decay_micros"))
  }

  /** Trailing-window per-key daily features — the feature-store shape:
    * for every (key, active day), the day's own activity plus the
    * trailing `windowDays`-day rolling totals and the gap since the
    * key's previous active day. The inputs feed recency-aware
    * sampling, churn features, and activity-based curation weights.
    *
    * Determinism: values are floored to integer MICROS at the DAY
    * rollup, so every rolling sum is an exact long — range-frame sums
    * of doubles would be partition-order-sensitive, longs are not.
    *
    * Scale shape: the corpus-sized work is ONE partial-aggregated
    * shuffle down to (key, day) rows; the window functions then run
    * over per-key DAY SERIES, which are calendar-bounded (≤ days in
    * the retention horizon per key, thousands of rows at most) — the
    * sort inside each window partition never sees raw events. Output:
    * (key, day, n_events, v_micros, n_win, v_win_micros,
    * days_since_prev — NULL on the key's first active day). */
  def rollingDailyFeatures(events: DataFrame, keyCol: String,
                           tsMsCol: String, valueCol: String,
                           windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, "windowDays must be positive")
    import org.apache.spark.sql.expressions.Window
    // exact integer day: subtract the remainder first so the double
    // division is of an exact multiple (correctly-rounded → exact int)
    val tsL = col(tsMsCol).cast("long")
    val dayCol = ((tsL - pmod(tsL, lit(86400000L))) / lit(86400000L))
      .cast("long")
    val daily = events
      .select(col(keyCol).as("key"), dayCol.as("day"),
        floor(col(valueCol).cast("double") * lit(1000000.0) + lit(0.5))
          .cast("long").as("vm"))
      .groupBy("key", "day")
      .agg(count(lit(1)).as("n_events"), sum(col("vm")).as("v_micros"))
    val wRange = Window.partitionBy("key").orderBy("day")
      .rangeBetween(-(windowDays - 1).toLong, 0L)
    val wLag = Window.partitionBy("key").orderBy("day")
    daily.select(col("key"), col("day"), col("n_events"), col("v_micros"),
      sum(col("n_events")).over(wRange).as("n_win"),
      sum(col("v_micros")).over(wRange).as("v_win_micros"),
      (col("day") - lag(col("day"), 1).over(wLag)).as("days_since_prev"))
  }
}
