package graft.queries

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

class JsonExtractSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("typed JSON extraction: malformed and missing keys become NULL, never errors") {
    val s = spark
    import s.implicits._
    val df = Seq(
      """{"k": 7}""", """{"k": null}""", """{"other": 1}""",
      "not json at all", "", null.asInstanceOf[String]
    ).toDF("props")
    val k = from_json(col("props"),
      StructType(Seq(StructField("k", LongType)))).getField("k")
    val got = df.select(k.as("k")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.toSeq == Seq(Some(7L), None, None, None, None, None))
  }

  test("q_json_extract aggregates per event_type with exact long stats") {
    val got = RelQueries.qJsonExtract(spark, "/root/testdata/sf0.001")
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      // every testdata props payload parses, so n == n_k, and the
      // k domain is [0, 99]
      assert(r.getLong(1) == r.getLong(2), s"n != n_k in $r")
      assert(r.getLong(4) >= 0 && r.getLong(5) <= 99)
    }
  }
}
