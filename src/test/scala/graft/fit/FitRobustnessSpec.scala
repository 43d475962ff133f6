package graft.fit

import graft.SparkTestSession
import graft.meta.{AttrMeta, C45Schema}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fit robustness on the real testdata views (FIXTURES.md §2). */
class FitRobustnessSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def lineitemView = {
    val schema = C45Schema(
      Seq(AttrMeta("l_returnflag", isNumeric = false),
        AttrMeta("l_linenumber", isNumeric = false),
        AttrMeta("l_quantity", isNumeric = true),
        AttrMeta("l_discount", isNumeric = true)),
      "l_linestatus", Seq("F", "O"))
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .withColumn("l_linenumber", col("l_linenumber").cast("string"))
    (df, schema)
  }

  test("fit is deterministic: two runs produce identical leaf sets") {
    val (df, schema) = lineitemView
    val p = C45Params(maxDepth = 3)
    val a = C45.fit(df, schema, p).leaves.map(_.encode)
    val b = C45.fit(df, schema, p).leaves.map(_.encode)
    assert(a == b)
  }

  test("customer view (5-class) fits and beats the majority baseline on training data") {
    val df = spark.read.parquet(s"$sf/customer.parquet")
    val schema = C45Schema(
      Seq(AttrMeta("c_nationkey", isNumeric = true),
        AttrMeta("c_acctbal", isNumeric = true)),
      "c_mktsegment", Nil)
    val m = C45.fit(df, schema, C45Params(maxDepth = 4))
    assert(m.leaves.nonEmpty && m.leaves.forall(_.label.isDefined))
    val n = df.count().toDouble
    val majorityAcc = df.groupBy("c_mktsegment").count()
      .agg(max("count")).collect()(0).getLong(0) / n
    val acc = m.transform(df)
      .filter(col("prediction") === col("c_mktsegment")).count() / n
    assert(acc >= majorityAcc, s"acc $acc < majority $majorityAcc")
  }

  test("orders view fit covers every row with exactly one leaf") {
    val df = spark.read.parquet(s"$sf/orders.parquet")
      .withColumn("o_orderpriority", col("o_orderpriority").cast("string"))
    val schema = C45Schema(
      Seq(AttrMeta("o_orderpriority", isNumeric = false),
        AttrMeta("o_totalprice", isNumeric = true)),
      "o_orderstatus", Nil)
    val m = C45.fit(df, schema, C45Params(maxDepth = 3))
    val names = schema.attrNames
    val nMatches = m.leaves
      .map(r => when(r.toPredicate(names), 1).otherwise(0)).reduce(_ + _)
    assert(df.withColumn("m", nMatches).filter(col("m") =!= 1).count() == 0)
  }
}
