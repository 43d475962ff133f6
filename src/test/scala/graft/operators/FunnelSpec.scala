package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Funnel semantics on a hand-built event log (every edge case pinned
  * driver-side) plus the plan property the window formulation exists
  * for: one Exchange for the whole funnel, not one per step. */
class FunnelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val steps = Seq("A", "B", "C")

  // (user, event_id, ts, step)
  private def ev(rows: (Long, Long, Long, String)*) =
    rows.toDF("user_id", "event_id", "ts_ms", "step")

  private def stages(df: org.apache.spark.sql.DataFrame) =
    Funnel.stageTimes(df, "user_id", "step", "ts_ms", "event_id", steps)
      .orderBy("user_id")
      .collect()
      .map(r => (r.getLong(0),
        Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))

  test("complete funnel, in order") {
    val out = stages(ev((1, 1, 10, "A"), (1, 2, 20, "B"), (1, 3, 30, "C")))
    assert(out.toSeq == Seq((1L, Some(10L), Some(20L), Some(30L))))
  }

  test("wrong order does not count: B before A reaches only stage 1") {
    val out = stages(ev((1, 1, 20, "A"), (1, 2, 10, "B"), (1, 3, 5, "C")))
    assert(out.toSeq == Seq((1L, Some(20L), None, None)))
  }

  test("same timestamp is not 'after': strict ordering between stages") {
    val out = stages(ev((1, 1, 10, "A"), (1, 2, 10, "B"), (1, 3, 30, "C")))
    assert(out.toSeq == Seq((1L, Some(10L), None, None)))
  }

  test("earliest qualifying completion wins; later repeats ignored") {
    val out = stages(ev(
      (1, 1, 10, "A"), (1, 2, 40, "B"), (1, 3, 20, "B"),
      (1, 4, 50, "C"), (1, 5, 25, "C")))
    // B: earliest after t1=10 is 20 (not 40); C: earliest after 20 is 25
    assert(out.toSeq == Seq((1L, Some(10L), Some(20L), Some(25L))))
  }

  test("a later A cannot resurrect an earlier B") {
    // B at 15 counts because A at 10 precedes it — but for user 2 the
    // only A is at 20, so B at 15 never qualifies
    val out = stages(ev(
      (1, 1, 10, "A"), (1, 2, 15, "B"),
      (2, 3, 20, "A"), (2, 4, 15, "B")))
    assert(out.toSeq == Seq(
      (1L, Some(10L), Some(15L), None),
      (2L, Some(20L), None, None)))
  }

  test("users are independent; non-step events ignored") {
    val df = ev(
      (1, 1, 10, "A"), (1, 2, 20, "B"), (1, 3, 30, "C"),
      (2, 4, 10, "B"), (2, 5, 20, "C"),
      (3, 6, 10, "A")) // user 3 stalls at stage 1
    val out = stages(df)
    assert(out.toSeq == Seq(
      (1L, Some(10L), Some(20L), Some(30L)),
      (2L, None, None, None),
      (3L, Some(10L), None, None)))
  }

  test("whole funnel plans exactly one exchange (not one per step)") {
    val df = graft.sources.Tables.loadEventsMs(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_id"), col("ts_ms"),
        col("event_type").as("step"))
    val staged = Funnel.stageTimes(df, "user_id", "step", "ts_ms",
      "event_id", Seq("view", "click", "purchase"))
    val plan = staged.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"expected ONE shuffle for the funnel, got $exchanges:\n$plan")
  }
}
