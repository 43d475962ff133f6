package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TemporalJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("asof join picks the most recent right row at or before each left ts") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 10L, "e1"), (1L, 20L, "e2"), (1L, 5L, "e0"),
      (2L, 50L, "f1")).toDF("k", "ts", "tag")
    val right = Seq((1L, 10L, 1.0), (1L, 15L, 2.0), (2L, 60L, 9.0))
      .toDF("k", "rts", "v")
    val got = TemporalJoin.asofJoin(left, right, "k", "ts", "rts",
        Seq("rts", "v")).collect()
      .map(r => r.getAs[String]("tag") ->
        (Option(r.getAs[java.lang.Long]("asof_rts")).map(_.toLong),
          Option(r.getAs[java.lang.Double]("asof_v")).map(_.toDouble))).toMap
    assert(got("e1") == (Some(10L), Some(1.0)), "tie at equal ts matches")
    assert(got("e2") == (Some(15L), Some(2.0)), "latest prior row wins")
    assert(got("e0") == (None, None), "no prior right row → nulls")
    assert(got("f1") == (None, None), "keys do not leak across partitions")
  }

  test("asof join carries all value columns from the SAME right row") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 100L)).toDF("k", "ts")
    val right = Seq((1L, 10L, 1.0, "a"), (1L, 20L, 2.0, "b"))
      .toDF("k", "rts", "v", "w")
    val got = TemporalJoin.asofJoin(left, right, "k", "ts", "rts",
      Seq("v", "w")).collect()(0)
    assert(got.getAs[Double]("asof_v") == 2.0 &&
      got.getAs[String]("asof_w") == "b")
  }

  test("asof join plans ONE shuffle and no join operator at all") {
    // The load-bearing 100 TB claim (TemporalJoin scaladoc): as-of is
    // union + running window — ONE hash exchange on the key feeding
    // one sort, never an inequality join (which would plan as a
    // broadcast-nested-loop / cartesian range product). Pin the plan:
    // exactly one shuffle exchange, zero join nodes of any kind, and
    // no second exchange after the union reaches the window.
    val s = spark
    import s.implicits._
    val left = (0 until 64).map(i => (i.toLong % 4, i.toLong, s"e$i"))
      .toDF("k", "ts", "tag")
    val right = (0 until 32).map(i => (i.toLong % 4, i.toLong * 2, i * 1.0))
      .toDF("k", "rts", "v")
    val got = TemporalJoin.asofJoin(left, right, "k", "ts", "rts", Seq("v"))
    got.collect() // materialize so AQE finalizes the executed plan
    // AQE's toString prints the final plan followed by the initial
    // plan — count exchanges in the final section only
    val plan = got.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1,
      s"asof join must shuffle exactly once (got $shuffles):\n$plan")
    for (bad <- Seq("SortMergeJoin", "BroadcastNestedLoopJoin",
        "CartesianProduct", "BroadcastHashJoin"))
      assert(!plan.contains(bad), s"unexpected $bad in asof plan:\n$plan")
  }

  test("reserved / missing / colliding column names fail loudly, not silently") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 100L)).toDF("k", "ts")
    val right = Seq((1L, 10L, 1.0)).toDF("k", "rts", "v")
    // a user column named like an internal would be silently clobbered
    intercept[IllegalArgumentException] {
      TemporalJoin.asofJoin(left.withColumnRenamed("ts", "__ts"),
        right, "k", "__ts", "rts", Seq("v"))
    }
    // a rightValCol that doesn't exist used to surface as an analysis
    // error deep in the plan; now it's a precondition
    intercept[IllegalArgumentException] {
      TemporalJoin.asofJoin(left, right, "k", "ts", "rts", Seq("nope"))
    }
    // output asof_v colliding with an existing left column
    intercept[IllegalArgumentException] {
      TemporalJoin.asofJoin(left.withColumn("asof_v", lit(0)),
        right, "k", "ts", "rts", Seq("v"))
    }
    // pointInInterval: overlapping column names across sides
    intercept[IllegalArgumentException] {
      TemporalJoin.pointInInterval(
        Seq((1L, 5L)).toDF("k", "t"),
        "k", "t",
        Seq((1L, 0L, 9L)).toDF("k", "lo", "hi"),
        "k", "lo", "hi", 10L)
    }
  }

  test("point-in-interval matches the inequality join exactly across bucket widths") {
    val s = spark
    import s.implicits._
    val points = (1L to 50L).map(t => (t, 1L, t * 7 % 97)).toDF("pid", "k", "t")
    val intervals = Seq((1L, 10L, 0L, 20L), (2L, 10L, 15L, 40L), (3L, 10L, 90L, 96L))
      .map { case (iid, _, a, b) => (iid, 1L, a, b) }
      .toDF("iid", "ik", "lo", "hi")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = key(points.join(intervals,
      col("k") === col("ik") && col("t") >= col("lo") && col("t") <= col("hi")))
    for (w <- Seq(1L, 5L, 64L, 1000L)) {
      val got = key(TemporalJoin.pointInInterval(
        points, "k", "t", intervals, "ik", "lo", "hi", w))
      assert(got == expected, s"bucketWidth=$w")
    }
    assert(expected.nonEmpty)
  }

  test("point-in-interval plans a hash/merge join on the bucket key, never a nested loop") {
    // The load-bearing 100 TB claim (TemporalJoin scaladoc): the range
    // predicate must reach the executors as an EQUI-join on
    // (bucket, key) plus a residual filter — a naive ts-inequality
    // join plans as BroadcastNestedLoopJoin / cartesian range product,
    // O(|points|·|intervals|). Pin the executed plan: some equi-join
    // operator (broadcast-hash at test volume, sort-merge/shuffled-
    // hash at scale — all key-partitioned) and zero loop joins.
    val s = spark
    import s.implicits._
    val points = (1L to 200L).map(t => (t, t % 4, t * 7 % 97)).toDF("pid", "k", "t")
    val intervals = (1L to 40L).map(i => (i, i % 4, i * 2, i * 2 + 10))
      .toDF("iid", "ik", "lo", "hi")
    val got = TemporalJoin.pointInInterval(
      points, "k", "t", intervals, "ik", "lo", "hi", 8L)
    got.collect()
    val plan = got.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
      .exists(plan.contains),
      s"range join must plan as an equi-join on the bucket key:\n$plan")
    for (bad <- Seq("BroadcastNestedLoopJoin", "CartesianProduct"))
      assert(!plan.contains(bad), s"unexpected $bad in range-join plan:\n$plan")
  }
}
