package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Sampling.dsirResample]] — DSIR importance resampling: planted
  * target-like docs outrank off-target docs, the keep set is exactly
  * nKeep, and the scored output is partition-independent. */
class DsirResampleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("target-like docs carry higher importance weights than off-target docs") {
    // target speaks only 'alpha beta'; raw has alpha-ish docs (1-3)
    // and gamma-ish docs (11-13) — the likelihood ratio must rank
    // every alpha doc above every gamma doc
    val target = Seq((100L, "alpha beta alpha beta alpha"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (1L, "alpha beta alpha"), (2L, "beta alpha beta"), (3L, "alpha alpha"),
      (11L, "gamma delta gamma"), (12L, "delta gamma delta"), (13L, "gamma gamma")
    ).toDF("doc_id", "text")
    val w = Sampling.dsirResample(raw, target, "doc_id", "text",
        nBuckets = 64, nKeep = 3)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("logw_micros"))
      .toMap
    val alphaMin = Seq(1L, 2L, 3L).map(w).min
    val gammaMax = Seq(11L, 12L, 13L).map(w).max
    assert(alphaMin > gammaMax,
      s"alpha docs ($w) must outweigh gamma docs under the alpha-beta target")
  }

  test("keep set is exactly nKeep, ranked by noised score with id ties") {
    val out = Sampling.dsirResample(docs,
        docs.filter(col("lang") === "en"), "doc_id", "text", 256, 50)
      .collect()
    assert(out.length == docs.count())
    assert(out.count(_.getAs[Boolean]("keep")) == 50)
    val minKept = out.filter(_.getAs[Boolean]("keep"))
      .map(_.getAs[Long]("score_micros")).min
    val maxDropped = out.filterNot(_.getAs[Boolean]("keep"))
      .map(_.getAs[Long]("score_micros")).max
    assert(minKept >= maxDropped,
      "every kept score must be >= every dropped score (modulo id ties)")
  }

  test("scores and keep set are partition-independent") {
    def run(raw: org.apache.spark.sql.DataFrame) =
      Sampling.dsirResample(raw, raw.filter(col("lang") === "en"),
          "doc_id", "text", 256, 50)
        .collect().map(r => (r.getAs[Long]("id"),
          r.getAs[Long]("logw_micros"), r.getAs[Long]("score_micros"),
          r.getAs[Boolean]("keep"))).sortBy(_._1).toSeq
    assert(run(docs) == run(docs.repartition(13)))
  }
}
