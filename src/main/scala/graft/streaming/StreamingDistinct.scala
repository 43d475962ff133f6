package graft.streaming

import graft.functions.Hashing
import graft.operators.KmvAggregator
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Streaming per-window distinct-user cardinality via the mergeable
  * KMV sketch ([[graft.operators.KmvAggregator]]): the bounded-state
  * answer to "how many distinct users per day" on an unbounded
  * stream. An exact streaming `countDistinct` would hold every seen
  * key per open window in the state store — unbounded at corpus
  * scale; the sketch caps state at k longs per window regardless of
  * cardinality, and because its merge is a sorted distinct union the
  * estimate is identical under any micro-batch arrival order, so the
  * streaming run hash-matches the batch replay exactly. Hashes come
  * from the engine-portable salted-md5 family, the estimator is
  * [[graft.operators.Sampling.kmvDistinct]]'s `(k−1)·2^60 / h_(k)`
  * (exact count when fewer than k distinct), and windows close under
  * the usual watermark/append-mode emission rule. */
object StreamingDistinct {

  /** Per-tumbling-window KMV distinct estimate of `keyCol`. Output:
    * (w_start, k_actual, kth_hash, est_distinct). */
  def windowedDistinct(events: DataFrame, keyCol: String, k: Int,
                       windowLen: String = "1 day",
                       watermark: String = "6 hours"): DataFrame =
    windowedCore(events
      .withColumn("ts_time", timestamp_millis(Tables.epochMs(events, "ts")))
      .withWatermark("ts_time", watermark), keyCol, k, windowLen)

  /** Batch twin (no watermark — batch plans reject it) for
    * differential testing: identical math, identical output. */
  def windowedDistinctBatch(events: DataFrame, keyCol: String, k: Int,
                            windowLen: String = "1 day"): DataFrame =
    windowedCore(events
      .withColumn("ts_time", timestamp_millis(Tables.epochMs(events, "ts"))),
      keyCol, k, windowLen)

  private def windowedCore(e: DataFrame, keyCol: String, k: Int,
                           windowLen: String): DataFrame = {
    val agg = udaf(new KmvAggregator(k), Encoders.scalaLong)
    e.withColumn("__h", Hashing.hash60(col(keyCol).cast("string")))
      .groupBy(window(col("ts_time"), windowLen).as("w"))
      .agg(agg(col("__h")).as("kmv"))
      .select(unix_millis(col("w.start")).as("w_start") +:
        graft.operators.Sketches.kmvColumns(col("kmv"), k): _*)
  }
}
