package graft.queries

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UnpivotSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("unpivot is the exact inverse of pivot on the same frame") {
    val s = spark
    import s.implicits._
    val long = Seq(("A", "x", 1.0), ("A", "y", 2.0),
      ("B", "x", 3.0), ("B", "y", 4.0)).toDF("k", "measure", "value")
    val wide = long.groupBy("k").pivot("measure", Seq("x", "y"))
      .agg(first("value"))
    val roundTrip = wide.unpivot(Array(col("k")),
        Array(col("x"), col("y")), "measure", "value")
      .collect().map(_.toSeq).toSet
    assert(roundTrip == long.collect().map(_.toSeq).toSet)
  }

  test("q_unpivot emits one long row per (group, measure)") {
    val got = RelQueries.qUnpivot(spark, "/root/testdata/sf0.001").collect()
    val groups = got.map(_.getString(0)).distinct
    assert(got.length == groups.length * 3)
    assert(got.map(_.getString(1)).distinct.sorted.toSeq ==
      Seq("cnt", "lines", "qty"))
  }
}
