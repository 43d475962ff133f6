package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[KmvAggregator]] — mergeable bottom-k-distinct sketch: dedup,
  * cap, merge associativity, and exact-below-k semantics; plus the
  * streaming windowed-distinct's batch twin against exact counts. */
class KmvAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("reduce dedups and caps at k, keeping the smallest hashes") {
    val a = new KmvAggregator(3)
    val buf = Seq(50L, 10L, 50L, 30L, 20L, 40L, 10L)
      .foldLeft(a.zero)(a.reduce)
    assert(buf == List(10L, 20L, 30L))
    assert(a.finish(buf) == KmvSketch(3, 30L))
  }

  test("merge is a sorted distinct union capped at k, in any order") {
    val a = new KmvAggregator(4)
    val l = List(1L, 3L, 5L)
    val r = List(2L, 3L, 7L, 9L)
    assert(a.merge(l, r) == List(1L, 2L, 3L, 5L))
    assert(a.merge(r, l) == a.merge(l, r))
    assert(a.merge(a.zero, l) == l)
  }

  test("fewer than k distinct values -> the sketch is the exact count") {
    val a = new KmvAggregator(16)
    val buf = Seq(7L, 7L, 3L, 3L, 11L).foldLeft(a.zero)(a.reduce)
    assert(a.finish(buf) == KmvSketch(3, 11L))
  }

  test("kmvPerGroup: exact below k per group, matches global KMV on one group") {
    val s = spark
    import s.implicits._
    val df = ((1 to 100).map(i => ("a", i % 7)) ++
      (1 to 50).map(i => ("b", i))).toDF("k", "v")
    val got = Sketches.kmvPerGroup(df, "k", "v", 64)
      .collect().map(r => r.getAs[String]("key") ->
        (r.getAs[Long]("k_actual"), r.getAs[Double]("est_distinct"))).toMap
    assert(got("a") == ((7L, 7.0)), "7 distinct < k -> exact")
    assert(got("b") == ((50L, 50.0)))
    // one group == the global sketch (same hash family, same estimator)
    val globalEst = Sampling.kmvDistinct(df.filter(col("k") === "a")
      .select("v"), "v", 64).collect().head.getAs[Double]("est_distinct")
    assert(got("a")._2 == globalEst)
  }

  test("batch windowed distinct: exact below k, within 25% above k on real events") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    import org.apache.spark.sql.functions._
    val eMs = events.withColumn("ts_ms",
      graft.sources.Tables.epochMs(events, "ts"))
    val exactByDay = eMs
      .select(expr("ts_ms div 86400000").as("day"), col("user_id"))
      .groupBy("day").agg(countDistinct("user_id").as("nd"))
      .collect().map(r => r.getAs[Long]("day") * 86400000L -> r.getAs[Long]("nd"))
      .toMap
    val est = graft.streaming.StreamingDistinct
      .windowedDistinctBatch(events, "user_id", k = 64)
      .collect()
      .map(r => r.getAs[Long]("w_start") ->
        (r.getAs[Long]("k_actual"), r.getAs[Double]("est_distinct")))
      .toMap
    assert(est.keySet == exactByDay.keySet)
    est.foreach { case (w, (kActual, e)) =>
      val n = exactByDay(w)
      if (kActual < 64) assert(e == n.toDouble, s"below k must be exact (w=$w)")
      else assert(math.abs(e - n) / n < 0.25, s"w=$w est=$e exact=$n")
    }
  }
}
