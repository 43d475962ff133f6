package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ProfilingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("numericHistogram buckets are equi-width, max lands in the last bucket") {
    val s = spark
    import s.implicits._
    // x in [0, 10], 5 buckets of width 2
    val df = Seq(0.0, 1.9, 2.0, 5.0, 9.9, 10.0).toDF("x")
    val got = Profiling.numericHistogram(df, Seq("x"), 5)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got == Map(0L -> 2L, 1L -> 1L, 2L -> 1L, 4L -> 2L),
      s"0,1.9->b0; 2->b1; 5->b2; 9.9,10->b4: $got")
  }

  test("numericHistogram: a constant column collapses to bucket 0") {
    val s = spark
    import s.implicits._
    val df = Seq(7.0, 7.0, 7.0).toDF("x")
    val got = Profiling.numericHistogram(df, Seq("x"), 10).collect()
    assert(got.length == 1 && got(0).getLong(1) == 0L && got(0).getLong(2) == 3L)
  }

  test("numericHistogram profiles several columns in one result") {
    val s = spark
    import s.implicits._
    val df = Seq((1.0, 100.0), (2.0, 200.0), (3.0, 300.0)).toDF("a", "b")
    val got = Profiling.numericHistogram(df, Seq("a", "b"), 2)
    assert(got.select("col_name").distinct().count() == 2)
    // counts per column must each total the row count
    val tot = got.groupBy("col_name").agg(sum("n").as("t"))
      .collect().map(_.getLong(1)).toSet
    assert(tot == Set(3L))
  }

  test("periodAnomalies flags exactly the planted spike, deterministically") {
    val s = spark
    import s.implicits._
    // key k: 9 calm periods of ~10 plus one 1000 spike -> |z| > 2 only
    // at the spike; key q: flat, flags nothing
    val rows = (1 to 9).map(p => ("k", p.toLong, 10.0 + p * 0.01)) ++
      Seq(("k", 10L, 1000.0)) ++ (1 to 10).map(p => ("q", p.toLong, 5.0))
    val df = rows.toDF("key0", "period0", "v")
    val got = Profiling.periodAnomalies(df, "key0", col("period0"), "v", 2.0)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("k", 10L)), s"only the spike flags: ${got.toSeq}")
    val again = Profiling.periodAnomalies(df.repartition(7), "key0",
      col("period0"), "v", 2.0)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(again.toSeq == got.toSeq, "partition-independent")
  }

  test("groupOutliers: the planted far vector ranks first in its group") {
    val s = spark
    import s.implicits._
    // group g: three near-identical vectors + one pointing away
    val df = Seq(
      (1L, Array(1.0f, 0.1f, 0.0f), "g"),
      (2L, Array(1.0f, 0.0f, 0.1f), "g"),
      (3L, Array(0.9f, 0.1f, 0.1f), "g"),
      (4L, Array(-1.0f, 0.2f, 0.0f), "g"))
      .toDF("id0", "vec", "grp0")
    val got = Similarity.groupOutliers(df, "id0", "vec", "grp0", k = 2)
      .orderBy("rnk").collect().map(_.getLong(0))
    assert(got.head == 4L, s"the anti-aligned vector is the top outlier: ${got.toSeq}")
  }
}
