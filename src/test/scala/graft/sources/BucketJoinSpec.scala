package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located join: the point of Bucketing.writeBucketed is
  * that an equi-join of two tables bucketed the same way needs NO
  * Exchange on either side — pin that plan property and the result's
  * equality with the plain (shuffled) join. */
class BucketJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def writeBoth(tag: String): (String, String) = {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_bkspec_$tag"
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val c = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_mktsegment")
    Bucketing.writeBucketed(o, s"bkspec_orders_$tag", s"$base/o", "o_custkey", 4)
    Bucketing.writeBucketed(c, s"bkspec_customer_$tag", s"$base/c", "c_custkey", 4)
    (s"bkspec_orders_$tag", s"bkspec_customer_$tag")
  }

  test("bucketed-bucketed equi-join plans with zero exchanges") {
    val (ot, ct) = writeBoth("plan")
    val o = Bucketing.readBucketed(spark, ot)
    val c = Bucketing.readBucketed(spark, ct)
    val j = o.hint("merge").join(c, o("o_custkey") === c("c_custkey"))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"),
      s"bucketed join should not shuffle either side:\n$plan")
    // the bucket layout is real: 4 bucket files per table on disk
    assert(plan.contains("SelectedBucketsCount: 4 out of 4"), plan)
  }

  test("bucketed mergeAggState refresh: zero-Exchange full-outer merge, exact result") {
    // SCALE.md's incremental-aggregate promise, made checkable: with
    // the standing state AND the delta state both bucketed on the
    // group key, the full-outer merge join needs no Exchange on either
    // side — the refresh cost is O(delta agg) + a co-located merge,
    // never a reshuffle of the accumulated state.
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_bkspec_incr"
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    // DECIMAL sums: double partial sums are order-sensitive, so an
    // incremental state would differ from recompute in the last ulp —
    // exact types are the contract for mergeAggState's "sum" combiner
    def aggState(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("o_custkey").agg(
        sum(col("o_totalprice").cast("decimal(18,2)")).as("total"),
        count(lit(1)).as("n"),
        max(col("o_totalprice")).as("maxp"))
    // history = 2/3 of orders, delta = the complementary batch
    val hist = aggState(orders.filter(col("o_orderkey") % 3 =!= 0))
    val delta = aggState(orders.filter(col("o_orderkey") % 3 === 0))
    Bucketing.writeBucketed(hist, "bkspec_state", s"$base/s", "o_custkey", 4)
    Bucketing.writeBucketed(delta, "bkspec_delta", s"$base/d", "o_custkey", 4)
    val st = Bucketing.readBucketed(spark, "bkspec_state").hint("merge")
    val dl = Bucketing.readBucketed(spark, "bkspec_delta")
    val merged = graft.operators.MergeOps.mergeAggState(st, dl,
      Seq("o_custkey"), Seq("total" -> "sum", "n" -> "sum", "maxp" -> "max"))
    val plan = merged.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") && plan.contains("FullOuter"), plan)
    assert(!plan.contains("Exchange"),
      s"bucketed state merge should not shuffle either side:\n$plan")
    // merged state == re-aggregating everything from scratch
    val want = aggState(orders).orderBy("o_custkey").collect().toSeq
    assert(merged.orderBy("o_custkey").collect().toSeq == want)
  }

  test("bucketed join result == plain join result") {
    val (ot, ct) = writeBoth("res")
    val o = Bucketing.readBucketed(spark, ot)
    val c = Bucketing.readBucketed(spark, ct)
    val bucketed = o.hint("merge").join(c, o("o_custkey") === c("c_custkey"))
      .select("o_orderkey", "c_mktsegment")
    val po = spark.read.parquet(s"$sf/orders.parquet")
    val pc = spark.read.parquet(s"$sf/customer.parquet")
    val plain = po.join(pc, po("o_custkey") === pc("c_custkey"))
      .select("o_orderkey", "c_mktsegment")
    assert(bucketed.orderBy("o_orderkey").collect().toSeq ==
      plain.orderBy("o_orderkey").collect().toSeq)
    assert(bucketed.count() == po.count()) // every order has a customer
  }
}
