package graft.streaming

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the last streaming join
  * shape the surface lacked (enrichment covers stream-static). Left
  * events match right events with the same key whose time falls in
  * [left_time, left_time + interval].
  *
  * Scale shape: both sides are shuffled by key into the join's state
  * store once; the time-range condition plus BOTH watermarks bound the
  * state — Spark derives each side's retention from the interval (a
  * left row can stop waiting once the right watermark passes
  * `l_time + interval`; a right row once the left watermark passes its
  * time), so state is O(rows within the watermark horizon), never
  * O(stream). Append-mode inner join: each match emits exactly once,
  * when both sides have arrived — arrival ORDER within the horizon
  * does not change the result set, which is what makes the AvailableNow
  * replay equal the batch join (StreamingSpec pins both properties).
  *
  * `ts` arrives in whatever shape the parquet footer declares (see the
  * contract note on Tables.epochUs) and is compared at µs precision. */
object StreamingJoin {

  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   interval: String = "1 hour",
                   watermark: String = "2 hours"): DataFrame = {
    // the interval's exact length in µs, resolved once driver-side (a
    // one-row local plan, no cluster job): the RANGE comparison runs on
    // epoch-µs longs so sub-ms boundary events resolve exactly as a
    // batch engine comparing native timestamps would
    val intervalUs = left.sparkSession.range(1)
      .select(unix_micros(timestamp_micros(lit(0L)) + expr(s"INTERVAL $interval")))
      .first().getLong(0)
    // the watermark-visible conditions below truncate to ms; they stay
    // implied by (strictly looser than) the µs conditions only when
    // the interval is whole milliseconds
    require(intervalUs % 1000 == 0, s"interval '$interval' must be whole ms")
    val l = left
      .withColumn("l_time", timestamp_millis(Tables.epochMs(left, "ts")))
      .withColumn("l_us", Tables.epochUs(left, "ts"))
      .withWatermark("l_time", watermark)
      .select(col("event_id").as("l_id"), col(keyCol).as("l_key"),
        col("l_time"), col("l_us"))
    val r = right
      .withColumn("r_time", timestamp_millis(Tables.epochMs(right, "ts")))
      .withColumn("r_us", Tables.epochUs(right, "ts"))
      .withWatermark("r_time", watermark)
      .select(col("event_id").as("r_id"), col(keyCol).as("r_key"),
        col("r_time"), col("r_us"))
    // ms-truncated event-time bounds drive the state-store retention
    // (Spark derives each side's horizon from them); the µs-exact
    // bounds are a strictly tighter refinement evaluated as a plain
    // post-join filter, so state stays bounded AND the match set is
    // exact at full input precision
    l.join(r,
        col("l_key") === col("r_key") &&
          col("r_time") >= col("l_time") &&
          col("r_time") <= col("l_time") + expr(s"INTERVAL $interval") &&
          col("r_us") >= col("l_us") &&
          col("r_us") <= col("l_us") + lit(intervalUs))
      .select(col("l_id"), col("r_id"), col("l_key").as(keyCol),
        unix_millis(col("l_time")).as("l_ts_ms"),
        unix_millis(col("r_time")).as("r_ts_ms"))
  }
}
