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
