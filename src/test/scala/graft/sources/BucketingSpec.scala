package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SCALE.md claim check: pre-bucketed tables join WITHOUT a shuffle —
  * the co-location strategy for repeated big-big joins at cluster
  * scale (bucket pruning + exchange elimination are Catalyst features;
  * this spec proves the engine's tables are written in a layout that
  * activates them). */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("bucketed lineitem ⋈ orders plans without an Exchange on either side") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_b")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_b")
        .join(spark.table("o_b"), expr("l_orderkey = o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      val rows = joined.collect() // executes (AQE finalizes the plan)
      assert(rows.map(_.getLong(1)).sum == li.count())
      val plan = joined.queryExecution.executedPlan.toString
      // the join must consume the bucketed scans directly — no shuffle
      // on either join key (the groupBy's own exchange is expected)
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey"), plan.take(1200))
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey"), plan.take(1200))
      assert(plan.contains("Bucketed: true") &&
        plan.contains("SelectedBucketsCount: 8 out of 8"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}
