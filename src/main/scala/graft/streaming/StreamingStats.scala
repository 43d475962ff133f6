package graft.streaming

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming windowed aggregation over the events stream: tumbling
  * event-time windows with a watermark — the readStream → transform →
  * writeStream shape for continuous pipeline statistics (per-window
  * per-type counts and value sums, e.g. for monitoring an ingestion
  * pipeline's rates). Verified against the identical batch computation
  * in StreamingSpec. */
object StreamingStats {

  /** Raw events file stream (all columns, ts in its sniffed on-disk
    * type — see StreamingSessionize.eventSchema) — single-file table
    * streamed via glob filter, as in readEventStream. */
  def readRawEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(StreamingSessionize.eventSchema(spark, dir))
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)

  /** Windowed per-event-type stats over a streaming events DataFrame
    * (ts converted via the schema-adaptive Tables.epochMs). */
  def windowedTypeStats(events: DataFrame, windowLen: String = "1 hour",
                        watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("ts_time", timestamp_millis(Tables.epochMs(events, "ts")))
      .withWatermark("ts_time", watermark)
      .groupBy(window(col("ts_time"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(unix_millis(col("w.start")).as("w_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Second tumbling-window configuration over the same stream: daily
    * windows across ALL event types (no type key), with min/max value
    * extrema alongside the count/sum — proves the append-mode emission
    * rule and the decimal-sum determinism generalize beyond the hourly
    * per-type shape, and amortizes the per-query micro-batch startup
    * when run in the same SparkSession as [[windowedTypeStats]]. */
  def windowedDailyStats(events: DataFrame, windowLen: String = "1 day",
                         watermark: String = "6 hours"): DataFrame =
    events
      .withColumn("ts_time", timestamp_millis(Tables.epochMs(events, "ts")))
      .withWatermark("ts_time", watermark)
      .groupBy(window(col("ts_time"), windowLen).as("w"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .select(unix_millis(col("w.start")).as("w_start"), col("n"),
        col("sum_value"), col("min_value"), col("max_value"))

  /** Batch twin of [[windowedDailyStats]] for differential testing. */
  def windowedDailyStatsBatch(events: DataFrame, windowLen: String = "1 day"): DataFrame =
    events
      .withColumn("ts_time", timestamp_millis(Tables.epochMs(events, "ts")))
      .groupBy(window(col("ts_time"), windowLen).as("w"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .select(unix_millis(col("w.start")).as("w_start"), col("n"),
        col("sum_value"), col("min_value"), col("max_value"))

  /** Batch twin of [[windowedTypeStats]] (no watermark — batch plans
    * reject it) for differential testing. */
  def windowedTypeStatsBatch(events: DataFrame, windowLen: String = "1 hour"): DataFrame =
    events
      .withColumn("ts_time", timestamp_millis(Tables.epochMs(events, "ts")))
      .groupBy(window(col("ts_time"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(unix_millis(col("w.start")).as("w_start"), col("event_type"),
        col("n"), col("sum_value"))
}
