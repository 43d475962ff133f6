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
  * state. The join condition contains ONLY the key equality and the
  * two event-time range conjuncts over the watermarked TimestampType
  * columns — nothing else — because Spark derives each side's state
  * watermark by walking exactly those conjuncts (StreamingJoinHelper):
  * a left row is evictable once the right watermark passes
  * `l_time + interval`, a right row once the left watermark passes its
  * own time. Any extra conjunct over a non-watermarked column makes
  * that extraction fail and the state store grow O(stream), so the
  * µs-exact comparison rides IN the range conjuncts: TimestampType is
  * µs-precision natively, and `timestamp_micros(epochUs)` loses
  * nothing. State is therefore O(rows within the watermark horizon),
  * never O(stream) — StreamingSpec pins eviction by asserting
  * `numRowsRemoved > 0` across micro-batches. Append-mode inner join:
  * each match emits exactly once, when both sides have arrived —
  * arrival ORDER within the horizon does not change the result set,
  * which is what makes the AvailableNow replay equal the batch join
  * (StreamingSpec pins both properties).
  *
  * `ts` arrives in whatever shape the parquet footer declares (see the
  * contract note on Tables.epochUs) and is compared at µs precision. */
object StreamingJoin {

  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   interval: String = "1 hour",
                   watermark: String = "2 hours"): DataFrame = {
    val l = left
      .withColumn("l_time", timestamp_micros(Tables.epochUs(left, "ts")))
      .withWatermark("l_time", watermark)
      .select(col("event_id").as("l_id"), col(keyCol).as("l_key"),
        col("l_time"))
    val r = right
      .withColumn("r_time", timestamp_micros(Tables.epochUs(right, "ts")))
      .withWatermark("r_time", watermark)
      .select(col("event_id").as("r_id"), col(keyCol).as("r_key"),
        col("r_time"))
    l.join(r,
        col("l_key") === col("r_key") &&
          col("r_time") >= col("l_time") &&
          col("r_time") <= col("l_time") + expr(s"INTERVAL $interval"))
      .select(col("l_id"), col("r_id"), col("l_key").as(keyCol),
        unix_millis(col("l_time")).as("l_ts_ms"),
        unix_millis(col("r_time")).as("r_ts_ms"))
  }
}
