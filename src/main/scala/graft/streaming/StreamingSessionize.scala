package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** One input event (ts in epoch millis — see Sessionize for the exact
  * ns→ms conversion). */
case class SessEvent(event_id: Long, user_id: Long, ts_ms: Long, value: Double)

/** Open-session state carried across micro-batches per user. */
case class SessState(sessionId: Long, startMs: Long, lastMs: Long,
                     n: Long, sum: Double)

/** A closed session — same shape as the batch Sessionize output. */
case class SessOut(user_id: Long, session_id: Long, start_ms: Long,
                   end_ms: Long, n_events: Long, sum_value: Double)

/** Streaming-native sessionization: `flatMapGroupsWithState` over
  * user-keyed events. A session closes when a newer event for the same
  * user arrives more than `gapMs` later (evidence of inactivity); the
  * still-open tail session stays in state awaiting more events. Within
  * a micro-batch events are sorted by (ts, id) — late data across
  * batches is handled by the upstream watermark.
  *
  * This is the streaming dual of operators.Sessionize (the batch
  * gaps-and-islands window): identical session boundaries, identical
  * aggregates, verified against each other in StreamingSpec. */
object StreamingSessionize {

  /** The streaming source needs an explicit schema; pinning the ts type
    * blindly would silently reinterpret µs as ns (a 1000× event-time
    * error with NO analysis failure) whenever the testdata contract
    * shifts. Instead sniff the on-disk type from the parquet footer
    * driver-side — a schema-only read, no cluster job — and let
    * Tables.epochMs do the (type-checked, loud-on-unknown) conversion. */
  def eventSchema(spark: SparkSession, dir: String): StructType = {
    val tsType = spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
    StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
  }

  /** Read the events table as a file stream with ts normalized to exact
    * epoch-ms. The testdata tables are single parquet FILES, while the
    * file stream source requires a directory — stream the sf directory
    * with a glob filter instead. */
  def readEventStream(spark: SparkSession, dir: String): Dataset[SessEvent] = {
    import spark.implicits._
    val raw = spark.readStream.schema(eventSchema(spark, dir))
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    raw.select(col("event_id"), col("user_id"),
        graft.sources.Tables.epochMs(raw, "ts").as("ts_ms"), col("value"))
      .as[SessEvent]
  }

  def sessionize(events: Dataset[SessEvent],
                 gapMs: Long = 30 * 60 * 1000L): Dataset[SessOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[SessEvent], state: GroupState[SessState]) =>
          val sorted = it.toIndexedSeq.sortBy(e => (e.ts_ms, e.event_id))
          var cur = state.getOption
          val out = Vector.newBuilder[SessOut]
          sorted.foreach { e =>
            cur match {
              case Some(s) if e.ts_ms - s.lastMs <= gapMs =>
                cur = Some(s.copy(lastMs = e.ts_ms, n = s.n + 1,
                  sum = s.sum + e.value))
              case Some(s) =>
                out += SessOut(user, s.sessionId, s.startMs, s.lastMs, s.n, s.sum)
                cur = Some(SessState(s.sessionId + 1, e.ts_ms, e.ts_ms, 1, e.value))
              case None =>
                cur = Some(SessState(1, e.ts_ms, e.ts_ms, 1, e.value))
            }
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }
}
