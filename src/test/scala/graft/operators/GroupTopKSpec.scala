package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GroupTopK must equal the row_number window formulation exactly
  * (score desc, id asc) while planning as a partial-combining
  * aggregate with no Window operator. */
class GroupTopKSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val customer =
    spark.read.parquet("/root/testdata/sf0.001/customer.parquet")

  test("matches the window formulation on real data") {
    val k = 3
    val top = GroupTopK.topKByKey(customer, col("c_nationkey").cast("long"),
        col("c_custkey"), round(col("c_acctbal"), 2), k)
      .select(col("key"), col("rank").cast("long").as("rank"),
        col("id"), col("score"))
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(round(col("c_acctbal"), 2).desc, col("c_custkey"))
    val ref = customer
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("c_nationkey").cast("long").as("key"),
        col("rank").cast("long"), col("c_custkey").as("id"),
        round(col("c_acctbal"), 2).as("score"))
    assert(top.orderBy("key", "rank").collect().toSeq ==
      ref.orderBy("key", "rank").collect().toSeq)
  }

  test("plans a partial aggregate, no Window") {
    val top = GroupTopK.topKByKey(customer, col("c_nationkey"),
      col("c_custkey"), col("c_acctbal"), 5)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_"), s"map-side combine missing:\n$plan")
    assert(!plan.contains("Window"), s"window crept in:\n$plan")
  }

  test("groups smaller than k emit all rows, still ranked") {
    import spark.implicits._
    val df = Seq((1L, 10L, 1.0), (1L, 11L, 3.0), (2L, 20L, 2.0))
      .toDF("g", "id", "s")
    val out = GroupTopK.topKByKey(df, col("g"), col("id"), col("s"), 5)
      .orderBy("key", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((1L, 1, 11L, 3.0), (1L, 2, 10L, 1.0),
      (2L, 1, 20L, 2.0)))
  }
}
