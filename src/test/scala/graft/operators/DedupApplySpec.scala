package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupApplySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("keepCanonical keeps each cluster's min id and every untouched row") {
    val s = spark
    import s.implicits._
    val corpus = Seq(1L, 2L, 3L, 4L, 5L, 9L).toDF("id")
    // clusters: {1,2,3} (chained — 1-2, 2-3 with no 1-3 edge) and {4,5}
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("i", "j")
    val kept = Dedup.keepCanonical(corpus, "id", pairs)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 4L, 9L)) // transitive members collapse too
  }

  test("keepCanonical with no pairs is the identity") {
    val s = spark
    import s.implicits._
    val corpus = Seq(1L, 2L).toDF("id")
    val pairs = Seq.empty[(Long, Long)].toDF("i", "j")
    assert(Dedup.keepCanonical(corpus, "id", pairs).count() == 2)
  }
}
