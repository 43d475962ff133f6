package graft.streaming

import graft.SparkTestSession
import graft.operators.Sessionize
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Differential tests: the streaming formulations must agree with
  * their batch duals on the same events data. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("streaming sessionization matches batch gaps-and-islands " +
    "(all sessions closed by a later event)") {
    val stream = StreamingSessionize.readEventStream(spark, sf)
    val q = StreamingSessionize.sessionize(stream).writeStream
      .format("memory").queryName("sess_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("sess_out")
      .select("user_id", "session_id", "start_ms", "end_ms", "n_events", "sum_value")
      .collect().map(_.toSeq).toSet

    // batch dual, minus each user's final (still-open) session
    val batch = Sessionize.sessionize(
      spark.read.parquet(s"$sf/events.parquet"))
    val lastPerUser = batch.groupBy("user_id")
      .agg(max("session_id").as("session_id"))
    val closedBatch = batch.join(lastPerUser,
        Seq("user_id", "session_id"), "left_anti")
      .select("user_id", "session_id", "start_ms", "end_ms", "n_events", "sum_value")
      .collect().map { r =>
        // batch sums via decimal; streaming sums doubles sequentially —
        // normalize to 2 decimals for comparison
        r.toSeq.updated(5, math.round(r.getDouble(5) * 100) / 100.0)
      }.toSet
    val streamedNorm = streamed.map(s =>
      s.updated(5, math.round(s(5).asInstanceOf[Double] * 100) / 100.0))
    assert(streamedNorm == closedBatch)
    assert(streamed.nonEmpty)
  }

  test("streaming dedup keeps exactly one row per distinct content hash") {
    val q = StreamingDedup.dedupStream(
        StreamingDedup.readDocStream(spark, sf))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("dedup_out")
    val batch = graft.operators.Dedup.exact(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text")
    assert(streamed.count() == batch.count())
    assert(streamed.select("text_hash").distinct().count() == streamed.count())
  }

  test("streaming windowed stats match the batch twin") {
    val stream = spark.readStream
      .schema(StreamingSessionize.eventSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sf)
    val q = StreamingStats.windowedTypeStats(stream).writeStream
      .format("memory").queryName("win_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // append mode only emits windows the watermark has passed; every
    // emitted row must match the batch twin exactly
    val streamed = spark.table("win_out").collect().map(_.toSeq).toSet
    val batch = StreamingStats.windowedTypeStatsBatch(
        spark.read.parquet(s"$sf/events.parquet"))
      .collect().map(_.toSeq).toSet
    assert(streamed.subsetOf(batch))
    assert(streamed.nonEmpty)
  }

  test("daily windowed stats emit EXACTLY the watermark-closed batch windows") {
    // Stronger than the hourly subset check: the emission rule is
    // pinned exactly — append mode emits precisely the windows whose
    // end the final watermark (max event time − 6h) has passed, and
    // each emitted row equals the batch twin bit-for-bit (the same
    // rule the q_stream_window_daily DuckDB oracle mirrors).
    val stream = spark.readStream
      .schema(StreamingSessionize.eventSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sf)
    val q = StreamingStats.windowedDailyStats(stream).writeStream
      .format("memory").queryName("win_daily_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("win_daily_out").collect().map(_.toSeq).toSet
    val events = spark.read.parquet(s"$sf/events.parquet")
    val maxMs = events.agg(max(expr("ts div 1000000"))).collect()(0).getLong(0)
    val dayMs = 86400000L
    val expected = StreamingStats.windowedDailyStatsBatch(events)
      .filter(col("w_start") + dayMs <= maxMs - 21600000L)
      .collect().map(_.toSeq).toSet
    assert(streamed == expected)
    assert(streamed.nonEmpty)
  }

  test("stream-static enrichment equals the batch join exactly") {
    val stream = spark.readStream
      .schema(StreamingSessionize.eventSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sf)
    val customers = spark.read.parquet(s"$sf/customer.parquet")
    val q = StreamingEnrich.enrich(stream, customers,
        "user_id", "c_custkey", Seq("c_mktsegment"))
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // stateless stream-static join: every arriving event appears
    // exactly once with its dimension attributes — no emission rule,
    // so the batch join is the EXACT result, not a superset
    val streamed = spark.table("enrich_out")
      .select("event_id", "user_id", "c_mktsegment")
      .collect().map(_.toSeq).toSet
    val batch = StreamingEnrich.enrich(
        spark.read.parquet(s"$sf/events.parquet"), customers,
        "user_id", "c_custkey", Seq("c_mktsegment"))
      .select("event_id", "user_id", "c_mktsegment")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
