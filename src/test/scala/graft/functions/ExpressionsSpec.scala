package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class ExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("DotProduct matches the higher-order zip_with formulation bit-for-bit") {
    val s = spark
    import s.implicits._
    val rnd = new Random(7)
    val rows = (1 to 50).map { i =>
      (i, Seq.fill(64)(rnd.nextDouble()), Seq.fill(64)(rnd.nextDouble()))
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"),
      DotProduct.dot(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("slow")).collect()
    got.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2), s"id ${r.getInt(0)}")
    }
  }

  test("SortedIntersectCount matches size(array_intersect) on sorted distinct arrays") {
    val s = spark
    import s.implicits._
    val rnd = new Random(11)
    val vocab = (1 to 40).map(i => s"w$i")
    val rows = (1 to 100).map { i =>
      (i, rnd.shuffle(vocab).take(rnd.nextInt(20) + 1).sorted,
        rnd.shuffle(vocab).take(rnd.nextInt(20) + 1).sorted)
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"),
      SortedIntersectCount.sortedIntersectCount(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("slow")).collect()
    got.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"id ${r.getInt(0)}")
    }
  }

  test("native expressions are callable from SQL after registration") {
    graft.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |  graft_sorted_intersect_count(array('a','b'), array('b','c')) AS c
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getLong(1) == 1L)
  }

  test("expressions survive both codegen and interpreted paths") {
    val s = spark
    import s.implicits._
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0), Seq("a", "b"), Seq("b", "c")))
      .toDF("a", "b", "x", "y")
    // interpreted path via eval on collected expressions
    val r = df.select(
      DotProduct.dot(col("a"), col("b")).as("d"),
      SortedIntersectCount.sortedIntersectCount(col("x"), col("y")).as("c"))
      .collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getLong(1) == 1L)
  }
}
