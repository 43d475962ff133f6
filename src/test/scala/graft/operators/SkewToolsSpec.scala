package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewToolsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("saltedJoin equals the plain join on skewed data") {
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val r = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = l.join(r, Seq("l_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_totalprice")
      .collect().map(_.toSeq).toSet
    val salted = SkewTools.saltedJoin(l, r, "l_orderkey", "l_linenumber", 8)
      .select("l_orderkey", "l_linenumber", "o_totalprice")
      .collect().map(_.toSeq).toSet
    assert(salted == plain && plain.nonEmpty)
  }

  test("twoPhaseCountSum equals the direct aggregation") {
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
    val direct = l.groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("sum_value"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = SkewTools.twoPhaseCountSum(
        l, "l_returnflag", "l_quantity", "l_orderkey", 16)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == direct)
  }
}
