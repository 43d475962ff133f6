package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RetentionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("cohort retention counts users by first-day cohort and offset") {
    val s = spark
    import s.implicits._
    // user 1: days 10, 11, 13 (3 events on day 10 — must count once)
    // user 2: days 10, 13
    // user 3: day 11 only
    val ev = Seq(
      (1L, 10L), (1L, 10L), (1L, 10L), (1L, 11L), (1L, 13L),
      (2L, 10L), (2L, 13L),
      (3L, 11L)).toDF("user_id", "day")
    val got = Retention.cohortRetention(ev, "user_id", "day")
      .orderBy("cohort_day", "day_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (10L, 0L, 2L),  // users 1, 2 start on day 10
      (10L, 1L, 1L),  // user 1 back on day 11
      (10L, 3L, 2L),  // users 1, 2 back on day 13
      (11L, 0L, 1L))) // user 3's cohort of one
  }

  test("maxOffset trims the triangle; offset 0 equals cohort size") {
    val s = spark
    import s.implicits._
    val ev = Seq((1L, 5L), (1L, 6L), (1L, 95L), (2L, 5L))
      .toDF("user_id", "day")
    val got = Retention.cohortRetention(ev, "user_id", "day", maxOffset = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((5L, 0L, 2L), (5L, 1L, 1L))) // day-95 cell trimmed
  }

  test("collect_set fold equals the window-min formulation on real events") {
    val s = spark
    import s.implicits._
    // real corpus slice: the sf0.001 events table, day = ms div 86400000
    val ev = graft.sources.Tables.loadEventsMs(s, "/root/testdata/sf0.001")
      .withColumn("day", expr("ts_ms div 86400000"))
      .select("user_id", "day")
    val got = Retention.cohortRetention(ev, "user_id", "day")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val expected = ev.select(col("user_id"), col("day").cast("long").as("day"))
      .distinct()
      .withColumn("cohort_day", min("day").over(w))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("decayedScore: hand math at the horizon, half-life, and quarter-life") {
    val s = spark
    import s.implicits._
    val hl = 1000L
    val ev = Seq(
      (1L, 5000L, 8.0),  // at the horizon: full weight 8.0
      (1L, 4000L, 8.0),  // one half-life old: 4.0
      (2L, 3000L, 8.0)   // two half-lives old: 2.0
    ).toDF("user_id", "ts_ms", "value")
    val got = Retention.decayedScore(ev, "user_id", "ts_ms", "value", hl)
      .collect().map(r => r.getAs[Long]("key") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("decay_micros"))).toMap
    assert(got(1L) == ((2L, 12000000L))) // 8.0 + 4.0 in micros
    assert(got(2L) == ((1L, 2000000L)))
    // horizon is data-derived: shifting all timestamps equally is a no-op
    val shifted = ev.withColumn("ts_ms", col("ts_ms") + 123456L)
    val got2 = Retention.decayedScore(shifted, "user_id", "ts_ms", "value", hl)
      .collect().map(r => r.getAs[Long]("key") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("decay_micros"))).toMap
    assert(got2 == got)
  }

  test("decayedScore is partition-independent (exact micros)") {
    val events = graft.sources.Tables.loadEventsMs(
      spark, "/root/testdata/sf0.001")
    def run(df: org.apache.spark.sql.DataFrame) =
      Retention.decayedScore(df, "user_id", "ts_ms", "value", 604800000L)
        .collect().map(r => (r.getAs[Long]("key"), r.getAs[Long]("n_events"),
          r.getAs[Long]("decay_micros"))).sortBy(_._1).toSeq
    assert(run(events) == run(events.repartition(11)))
  }

  test("rollingDailyFeatures: hand-math trailing window, gap, and edges") {
    val s = spark
    import s.implicits._
    val day = 86400000L
    // user 1: days 0, 1, 3, 10; user 2: one day only
    val events = Seq(
      (1L, 0L * day, 1.0), (1L, 0L * day + 5, 2.0), // day 0: n=2, v=3.0
      (1L, 1L * day, 10.0),                          // day 1
      (1L, 3L * day, 100.0),                         // day 3
      (1L, 10L * day, 0.5),                          // day 10 (window slides off)
      (2L, 4L * day, 7.25)
    ).toDF("user_id", "ts_ms", "value")
    val got = Retention.rollingDailyFeatures(events, "user_id", "ts_ms",
        "value", windowDays = 7)
      .collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[Long]("day")) ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("v_micros"),
          r.getAs[Long]("n_win"), r.getAs[Long]("v_win_micros"),
          Option(r.getAs[Any]("days_since_prev")).map(_.asInstanceOf[Long]))))
      .toMap
    assert(got((1L, 0L)) == ((2L, 3000000L, 2L, 3000000L, None)))
    assert(got((1L, 1L)) == ((1L, 10000000L, 3L, 13000000L, Some(1L))))
    // day 3: window [−3, 3] covers days 0, 1, 3 → n 4, v 113
    assert(got((1L, 3L)) == ((1L, 100000000L, 4L, 113000000L, Some(2L))))
    // day 10: 7-day window [4, 10] covers only day 10
    assert(got((1L, 10L)) == ((1L, 500000L, 1L, 500000L, Some(7L))))
    assert(got((2L, 4L)) == ((1L, 7250000L, 1L, 7250000L, None)))
  }

  test("rollingDailyFeatures: deterministic under repartitioning") {
    val s = spark
    import s.implicits._
    val events = (1 to 4000).map(i =>
      (i % 13L, (i % 29).toLong * 86400000L + i, (i % 7) * 1.25))
      .toDF("user_id", "ts_ms", "value")
    def run(df: org.apache.spark.sql.DataFrame) =
      Retention.rollingDailyFeatures(df, "user_id", "ts_ms", "value")
        .collect().map(r => (r.getAs[Long]("key"), r.getAs[Long]("day"),
          r.getAs[Long]("n_win"), r.getAs[Long]("v_win_micros")))
        .sortBy(t => (t._1, t._2)).toSeq
    assert(run(events) == run(events.repartition(11)))
  }

  test("plan shape: two exchanges, no window sort") {
    val s = spark
    import s.implicits._
    val ev = Seq((1L, 10L), (2L, 11L)).toDF("user_id", "day")
    val plan = Retention.cohortRetention(ev, "user_id", "day")
      .queryExecution.executedPlan.toString
    // one user-keyed exchange (collect_set fold) + one cell rollup;
    // the window-based formulation would add a third exchange and a
    // per-user sort
    val exchanges = "(?i)exchange".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges:\n$plan")
    assert(!plan.contains("Window"), s"no window expected:\n$plan")
  }
}
