package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[Sketches.sampleBottomK]] / [[Sketches.sampleMergeQuantiles]] —
  * the mergeable distribution sketch: exact small-n quantiles, merge
  * ≡ one-shot, k-boundedness, determinism, and guards. */
class SampleQuantilesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def est(rows: Seq[(Long, String, Long, Double)], k: Int) =
    Sketches.sampleMergeQuantiles(
        Sketches.sampleBottomK(
          rows.toDF("day", "key", "event_id", "value"),
          "day", "key", "event_id", "value", k),
        k, Seq("50" -> 0.5, "90" -> 0.9))
      .collect()
      .map(r => r.getAs[String]("key") ->
        ((r.getAs[Long]("n_sample"), r.getAs[Long]("est_p50_micros"),
          r.getAs[Long]("est_p90_micros"))))
      .toMap

  test("k >= n keeps everything: exact empirical ceil-quantiles") {
    val rows = (1 to 10).map(i => (i.toLong % 3, "a", i.toLong, i.toDouble))
    val got = est(rows, k = 64)
    // ceil(0.5*10)=5th of 1..10 -> 5; ceil(0.9*10)=9th -> 9
    assert(got("a") === ((10L, 5000000L, 9000000L)))
  }

  test("merge == one-shot: batch split does not change the sketch") {
    val rows = (1 to 500).map(i => (i.toLong, "a", i.toLong, (i * 7 % 100).toDouble))
    val oneBatch = rows.map(r => (0L, r._2, r._3, r._4))
    assert(est(rows, 16) === est(oneBatch, 16))
  }

  test("sample stays k-bounded and deterministic under repartition") {
    val rows = (1 to 1000).map(i => (i.toLong % 10, "a", i.toLong, i.toDouble))
    val df = rows.toDF("day", "key", "event_id", "value")
    def run(parts: Int) = Sketches.sampleMergeQuantiles(
        Sketches.sampleBottomK(df.repartition(parts),
          "day", "key", "event_id", "value", 32),
        32, Seq("50" -> 0.5))
      .collect().map(r => (r.getAs[Long]("n_sample"),
        r.getAs[Long]("est_p50_micros"))).toSeq
    assert(run(2) === run(13))
    assert(run(2).head._1 === 32L)
  }

  test("keys sketch independently") {
    val rows = (1 to 10).map(i => (0L, "lo", i.toLong, i.toDouble)) ++
      (1 to 10).map(i => (0L, "hi", 100L + i, i * 1000.0))
    val got = est(rows, 64)
    assert(got("lo")._2 === 5000000L)
    assert(got("hi")._2 === 5000000000L)
  }

  test("guards fail loudly") {
    val df = Seq((0L, "a", 1L, 1.0)).toDF("day", "key", "event_id", "value")
    intercept[IllegalArgumentException] {
      Sketches.sampleBottomK(df, "day", "key", "event_id", "value", 0)
    }
    intercept[IllegalArgumentException] {
      Sketches.sampleMergeQuantiles(
        Sketches.sampleBottomK(df, "day", "key", "event_id", "value", 4),
        4, Seq("x" -> 1.5))
    }
  }
}
