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

  test("madOutliers flags the planted spike and survives sigma inflation") {
    val s = spark
    import s.implicits._
    // group a: tight cluster around 10 + one huge spike. The spike
    // inflates sigma enough that a mean/sigma screen at z=6 would
    // struggle; median=10, MAD=1 flags it trivially.
    val a = (1 to 20).map(i => ("a", i.toLong, 10.0 + (i % 3) - 1)) :+
      (("a", 99L, 100000.0))
    // group b: all identical -> MAD 0 -> only true deviants flag
    val b = (1 to 10).map(i => ("b", 100L + i, 5.0)) :+ (("b", 200L, 5.5))
    val df = (a ++ b).toDF("k", "eid", "v")
    val got = Profiling.madOutliers(df, "k", "eid", "v", thr = 6.0)
      .collect().map(r => (r.getAs[String]("key"), r.getAs[Long]("id")))
    assert(got.contains(("a", 99L)), "the spike must flag")
    assert(!got.exists { case (k, id) => k == "a" && id != 99L },
      "tight-cluster members must not flag")
    assert(got.contains(("b", 200L)), "MAD=0: any deviation flags")
    assert(got.count(_._1 == "b") == 1)
  }

  test("madOutliers approx=true agrees with the exact path on the planted spike") {
    val s = spark
    import s.implicits._
    // same fixture as above: the outliers sit far from the median/MAD
    // cutoff, so the sketch's edge error cannot flip any flag — the
    // scale path must reproduce the exact flagged set here.
    val a = (1 to 20).map(i => ("a", i.toLong, 10.0 + (i % 3) - 1)) :+
      (("a", 99L, 100000.0))
    val b = (1 to 10).map(i => ("b", 100L + i, 5.0)) :+ (("b", 200L, 5.5))
    val df = (a ++ b).toDF("k", "eid", "v")
    def flags(approx: Boolean) =
      Profiling.madOutliers(df, "k", "eid", "v", thr = 6.0, approx = approx)
        .collect().map(r => (r.getAs[String]("key"), r.getAs[Long]("id"))).toSet
    assert(flags(approx = true) == flags(approx = false))
  }

  test("madOutliers on real events matches a driver-side replay") {
    val events = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val rows = events.select(col("event_type"), col("event_id"),
        col("value").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (k, grp) =>
      val med = medianOf(grp.map(_._3).toSeq)
      val mad = medianOf(grp.map(x => math.abs(x._3 - med)).toSeq)
      grp.filter(x => math.abs(x._3 - med) > 6.0 * mad).map(x => (k, x._2)).toSeq
    }.toSet
    val got = Profiling.madOutliers(events, "event_type", "event_id", "value")
      .collect().map(r => (r.getAs[String]("key"), r.getAs[Long]("id"))).toSet
    assert(got == expected)
    assert(got.nonEmpty, "the synthetic events should contain MAD outliers")
  }

  private def winsRow(vals: Seq[Double], pLow: Double, pHigh: Double) = {
    import spark.implicits._
    val r = Profiling.winsorizeProfile(
        vals.map(("g", _)).toDF("k", "v"), "k", "v", pLow, pHigh)
      .collect().head
    (r.getAs[Long]("n"), r.getAs[Double]("lo"), r.getAs[Double]("hi"),
      r.getAs[Long]("n_clip_low"), r.getAs[Long]("n_clip_high"),
      r.getAs[Long]("mean_raw_micros"), r.getAs[Long]("mean_wins_micros"))
  }

  test("winsorize: hand math on an asymmetric tail") {
    // 0..9 plus a 100 outlier: p05 = 0.5, p95 interpolates between 9
    // and 100 -> 54.5; clip pulls the mean from 13.181818 to 9.090909
    val got = winsRow((0 to 9).map(_.toDouble) :+ 100.0, 0.05, 0.95)
    assert(got === ((11L, 0.5, 54.5, 1L, 1L, 13181818L, 9090909L)))
  }

  test("winsorize: symmetric clip leaves the mean unchanged") {
    val got = winsRow((0 to 10).map(_.toDouble), 0.05, 0.95)
    assert(got._2 === 0.5 && got._3 === 9.5)
    assert(got._4 === 1L && got._5 === 1L)
    assert(got._6 === got._7) // 0->0.5 and 10->9.5 cancel exactly
  }

  test("winsorize: groups profile independently") {
    import spark.implicits._
    val df = ((1 to 20).map(i => ("a", i.toDouble)) ++
      (1 to 20).map(i => ("b", i * 100.0))).toDF("k", "v")
    val got = Profiling.winsorizeProfile(df, "k", "v", 0.1, 0.9)
      .collect().map(r => r.getAs[String]("key") -> r.getAs[Double]("hi")).toMap
    assert(got("a") === 18.1 && got("b") === 1810.0)
  }

  test("winsorize: probability guard fails loudly") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Profiling.winsorizeProfile(Seq(("a", 1.0)).toDF("k", "v"),
        "k", "v", 0.9, 0.1)
    }
  }
}
