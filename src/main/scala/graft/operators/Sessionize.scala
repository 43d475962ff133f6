package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream sessionization (batch formulation): split each user's
  * event sequence into sessions at inactivity gaps > `gapMs`.
  *
  * Classic gaps-and-islands: lag over (user, time) → new-session flag →
  * running sum = session index → per-session aggregate. One shuffle by
  * user (the window) feeding one pre-aggregated groupBy — scale-safe as
  * long as a single user's history fits an executor (salt by time range
  * if a user is genuinely unbounded). Timestamps are compared in epoch
  * millis so results are identical across engines regardless of
  * parquet timestamp precision. The streaming-native equivalent lives
  * in graft.streaming.StreamingSessionize. */
object Sessionize {

  val DefaultGapMs: Long = 30 * 60 * 1000L

  def sessionize(events: DataFrame, userCol: String = "user_id",
                 tsCol: String = "ts", idCol: String = "event_id",
                 valueCol: String = "value",
                 gapMs: Long = DefaultGapMs): DataFrame = {
    // schema-adaptive exact ms conversion (ns-as-long, NTZ µs, TZ µs) —
    // the testdata ts contract lives in one place, Tables.epochMs
    val tsMs = graft.sources.Tables.epochMs(events, tsCol)
    val w = Window.partitionBy(userCol).orderBy(col("ts_ms"), col(idCol))
    events
      .withColumn("ts_ms", tsMs)
      .withColumn("prev_ms", lag(col("ts_ms"), 1).over(w))
      .withColumn("is_new",
        when(col("prev_ms").isNull || col("ts_ms") - col("prev_ms") > gapMs, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(userCol), col("session_id"))
      .agg(
        min(col("ts_ms")).as("start_ms"),
        max(col("ts_ms")).as("end_ms"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("sum_value"))
  }

  /** First-order Markov transition matrix over per-user event
    * sequences: for every (from_type, to_type) step observed in some
    * user's timeline, the step count and the exact row-normalized
    * probability — the behavioral fingerprint behind next-event
    * prediction, anomaly scoring (improbable transitions), and
    * funnel-hypothesis discovery (q_funnel checks ONE ordered path;
    * this surfaces which paths exist and how likely each hop is).
    *
    * Shape: one window shuffle by user (`lead` over (ts, id) — the
    * same deterministic per-user ordering sessionize uses, so a
    * user's history is the partition bound), then a partial-agg
    * count to the type×type matrix — output is bounded by the event
    * vocabulary squared, independent of corpus rows. The per-from
    * normalizer reuses the matrix itself (window over from_type on
    * the TYPE²-sized table, not the events).
    *
    * Determinism: counts are exact longs and
    * `p_micros = n · 10^6 div n_from` is one BIGINT division. */
  def transitionMatrix(events: DataFrame, userCol: String = "user_id",
                       tsCol: String = "ts", idCol: String = "event_id",
                       typeCol: String = "event_type"): DataFrame = {
    val tsMs = graft.sources.Tables.epochMs(events, tsCol)
    val w = Window.partitionBy(userCol).orderBy(col("ts_ms"), col(idCol))
    val steps = events
      .withColumn("ts_ms", tsMs)
      .select(col(userCol), col("ts_ms"), col(idCol),
        col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .where(col("to_type").isNotNull)
    val matrix = steps.groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
    val wf = Window.partitionBy("from_type")
    matrix
      .withColumn("n_from", sum(col("n")).over(wf))
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        expr("(n * 1000000L) div n_from").as("p_micros"))
  }
}
