package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** mergeAggState must equal re-aggregating the unioned inputs for any
  * batching — the distributive-combiner contract — including keys
  * present on only one side, and it must preserve exact types. */
class IncrAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val measures = Seq(("n", "sum"), ("s", "sum"), ("mn", "min"), ("mx", "max"))

  private def aggOf(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("k").agg(count(lit(1)).as("n"),
      sum(col("v").cast("decimal(18,2)")).as("s"),
      min("v").as("mn"), max("v").as("mx"))

  test("merged state == state of the union (shared, state-only, delta-only keys)") {
    val hist = Seq(("a", 1.5), ("a", 2.0), ("b", -3.25)).toDF("k", "v")
    val delta = Seq(("a", 10.0), ("c", 7.75)).toDF("k", "v")
    val merged = MergeOps.mergeAggState(aggOf(hist), aggOf(delta),
      Seq("k"), measures)
    val full = aggOf(hist.unionAll(delta))
    assert(merged.orderBy("k").collect().toSeq ==
      full.orderBy("k").collect().toSeq)
    // and the schema survives the merge (exact decimal, longs)
    assert(merged.schema("n").dataType.typeName == "long")
    assert(merged.schema("s").dataType.typeName.startsWith("decimal"))
  }

  test("empty delta / empty state are identities") {
    val hist = Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v")
    val empty = aggOf(hist.filter(lit(false)))
    val viaEmptyDelta = MergeOps.mergeAggState(aggOf(hist), empty, Seq("k"), measures)
    val viaEmptyState = MergeOps.mergeAggState(empty, aggOf(hist), Seq("k"), measures)
    val expect = aggOf(hist).orderBy("k").collect().toSeq
    assert(viaEmptyDelta.orderBy("k").collect().toSeq == expect)
    assert(viaEmptyState.orderBy("k").collect().toSeq == expect)
  }

  test("chained refreshes == one-shot aggregation on real data") {
    val ev = graft.sources.Tables.loadEventsMs(spark, "/root/testdata/sf0.001")
      .select(col("event_type").as("k"), col("value").as("v"), col("ts_ms"))
    val Array(b1, b2) = Array(0.5, 0.8).map { f =>
      val r = ev.agg(min("ts_ms"), max("ts_ms")).first()
      r.getLong(0) + ((r.getLong(1) - r.getLong(0)) * (f * 10).toInt) / 10
    }
    val s0 = aggOf(ev.filter(col("ts_ms") < b1))
    val s1 = MergeOps.mergeAggState(s0,
      aggOf(ev.filter(col("ts_ms") >= b1 && col("ts_ms") < b2)), Seq("k"), measures)
    val s2 = MergeOps.mergeAggState(s1,
      aggOf(ev.filter(col("ts_ms") >= b2)), Seq("k"), measures)
    assert(s2.orderBy("k").collect().toSeq ==
      aggOf(ev).orderBy("k").collect().toSeq)
  }

  test("rejects unknown combiners and missing columns") {
    val st = aggOf(Seq(("a", 1.0)).toDF("k", "v"))
    intercept[IllegalArgumentException] {
      MergeOps.mergeAggState(st, st, Seq("k"), Seq(("n", "avg")))
    }
    intercept[IllegalArgumentException] {
      MergeOps.mergeAggState(st.drop("mx"), st, Seq("k"), measures)
    }
  }
}
