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
      .schema(StreamingSessionize.eventSchema(spark, sf))
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
      .schema(StreamingSessionize.eventSchema(spark, sf))
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
    val maxMs = events.agg(max(graft.sources.Tables.epochMs(events, "ts")))
      .collect()(0).getLong(0)
    val dayMs = 86400000L
    val expected = StreamingStats.windowedDailyStatsBatch(events)
      .filter(col("w_start") + dayMs <= maxMs - 21600000L)
      .collect().map(_.toSeq).toSet
    assert(streamed == expected)
    assert(streamed.nonEmpty)
  }

  test("stream-static enrichment equals the batch join exactly") {
    val stream = spark.readStream
      .schema(StreamingSessionize.eventSchema(spark, sf))
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

  test("streaming bloom prune equals the batch filter, zero state") {
    // the runtime-filter Column is pure arithmetic over a literal
    // word array, so it drops non-joining events map-side at arrival
    // with no watermark and no streaming state
    val customers = spark.read.parquet(s"$sf/customer.parquet")
    val bkeys = customers
      .where(org.apache.spark.sql.functions.col("c_mktsegment") === "BUILDING")
      .select(org.apache.spark.sql.functions.col("c_custkey"))
    val words = graft.operators.Sketches.bloomWords(
      bkeys, "c_custkey", 65536, 4, salt = 91)
    val pass = graft.operators.Sketches.bloomMightContain(
      words, org.apache.spark.sql.functions.col("user_id"), 65536, 4,
      salt = 91)
    val stream = spark.readStream
      .schema(StreamingSessionize.eventSchema(spark, sf))
      .option("pathGlobFilter", "events.parquet")
      .parquet(sf)
    val q = stream.filter(pass)
      .writeStream.format("memory").queryName("bloom_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("bloom_out")
      .select("event_id").collect().map(_.getLong(0)).toSet
    val batch = spark.read.parquet(s"$sf/events.parquet")
      .filter(pass).select("event_id").collect().map(_.getLong(0)).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    // no false negatives at the stream boundary: every event whose
    // user IS a building customer survived
    val trueIds = spark.read.parquet(s"$sf/events.parquet")
      .join(bkeys.withColumnRenamed("c_custkey", "user_id"), "user_id")
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(trueIds.subsetOf(streamed))
  }

  test("stream-stream interval join equals the batch interval join") {
    val ev = spark.readStream
      .schema(StreamingSessionize.eventSchema(spark, sf))
      .option("pathGlobFilter", "events.parquet")
      .parquet(sf)
    val q = StreamingJoin.intervalJoin(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"), "user_id")
      .writeStream.format("memory").queryName("sjoin_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("sjoin_out")
      .collect().map(_.toSeq).toSet
    val b = spark.read.parquet(s"$sf/events.parquet")
    val batch = StreamingJoin.intervalJoin( // same plan works on batch
        b.filter(col("event_type") === "click"),
        b.filter(col("event_type") === "purchase"), "user_id")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("interval join emits a cross-micro-batch match exactly once") {
    val s = spark
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    // (event_id, ns-epoch ts, user_id)
    val left = MemoryStream[(Long, Long, Long)]
    val right = MemoryStream[(Long, Long, Long)]
    def shape(ms: MemoryStream[(Long, Long, Long)]) =
      ms.toDF.toDF("event_id", "ts", "user_id")
    val joined = StreamingJoin.intervalJoin(
      shape(left), shape(right), "user_id")
    val q = joined.writeStream.format("memory").queryName("sjoin_mb")
      .outputMode("append").start()
    try {
      val h = 3600L * 1000 * 1000 * 1000 // 1h in ns
      left.addData((1L, 10 * h, 7L))
      q.processAllAvailable() // batch 1: left only, no emission yet
      assert(spark.table("sjoin_mb").count() == 0)
      right.addData((2L, 10 * h + h / 2, 7L)) // in [t, t+1h] -> match
      right.addData((3L, 13 * h, 7L)) // outside the interval
      q.processAllAvailable() // batch 2: the match emits HERE, once
      val rows = spark.table("sjoin_mb")
        .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSeq == Seq((1L, 2L)))
      right.addData((4L, 10 * h + h / 4, 7L)) // second in-window right
      q.processAllAvailable()
      assert(spark.table("sjoin_mb").count() == 2,
        "late-but-within-watermark arrival still matches; nothing re-emits")
    } finally q.stop()
  }

  test("interval join state is BOUNDED: watermark advance evicts state rows") {
    // The scale property the join's design hinges on: the condition
    // holds ONLY watermarked-column conjuncts, so Spark derives a state
    // watermark for EACH side and cleans its store as the watermarks
    // advance. If any conjunct were over a non-watermarked column,
    // extraction would fail silently (results stay exact in append
    // mode) and numRowsRemoved would stay 0 forever — O(stream) state.
    val s = spark
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val left = MemoryStream[(Long, Long, Long)]
    val right = MemoryStream[(Long, Long, Long)]
    def shape(ms: MemoryStream[(Long, Long, Long)]) =
      ms.toDF.toDF("event_id", "ts", "user_id")
    val joined = StreamingJoin.intervalJoin(
      shape(left), shape(right), "user_id")
    val q = joined.writeStream.format("memory").queryName("sjoin_state")
      .outputMode("append").start()
    try {
      val h = 3600L * 1000 * 1000 * 1000 // 1h in ns
      left.addData((1L, 10 * h, 7L))
      right.addData((2L, 10 * h + h / 2, 7L))
      q.processAllAvailable() // the match emits; state holds both rows
      // jump event time far past the 2h watermark delay + 1h interval:
      // the batch-end watermark recompute passes every earlier row's
      // retention horizon on both sides
      left.addData((3L, 100 * h, 7L))
      right.addData((4L, 100 * h, 7L))
      q.processAllAvailable()
      // eviction executes in a batch AFTER the watermark advanced
      left.addData((5L, 101 * h, 7L))
      right.addData((6L, 101 * h, 7L))
      q.processAllAvailable()
      val removed = q.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsRemoved)).sum
      assert(removed > 0,
        "no state rows were ever evicted — the join's state watermark " +
          "extraction failed (a non-watermarked conjunct is back in the " +
          "join condition?) and the state store grows O(stream)")
    } finally q.stop()
  }
}
