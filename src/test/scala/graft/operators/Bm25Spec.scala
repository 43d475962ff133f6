package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[TextAnalysis.bm25]] — hand-math on a tiny corpus (the expected
  * micros are computed in the driver with the SAME formula, so any
  * divergence in factor order or rounding fails loudly), plus the
  * no-hit and idf-spread behaviors. */
class Bm25Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val k1 = 1.2
  private val b = 0.75

  /** The operator's exact contract, replayed scalar-side. */
  private def micros(tf: Long, df: Long, dl: Long, nDocs: Long,
                     sumDl: Long): Long = {
    val avgdl = sumDl.toDouble / nDocs
    val idf = math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))
    val w = idf * (tf * (k1 + 1.0)) /
      (tf + k1 * ((1.0 - b) + b * dl / avgdl))
    math.floor(w * 1e6 + 0.5).toLong
  }

  test("hand corpus: scores match the scalar replay, no-hit docs absent") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "apple apple apple apple"),
      (4L, "durian elderberry fig"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bm25(docs, "doc_id", "text",
        Seq("apple", "cherry"), k1, b)
      .collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_terms_hit"), r.getAs[Long]("score_micros"))).toMap
    // N = 4, sum_dl = 3 + 2 + 4 + 3 = 12; df(apple) = 2, df(cherry) = 1
    val exp = Map(
      1L -> ((1L, micros(tf = 2, df = 2, dl = 3, nDocs = 4, sumDl = 12))),
      2L -> ((1L, micros(tf = 1, df = 1, dl = 2, nDocs = 4, sumDl = 12))),
      3L -> ((1L, micros(tf = 4, df = 2, dl = 4, nDocs = 4, sumDl = 12))))
    assert(got == exp, s"got $got expected $exp")
  }

  test("a rarer term outscores a common one at equal tf and dl") {
    val docs = Seq(
      (1L, "rare pad pad"), (2L, "common pad pad"), (3L, "common pad pad"),
      (4L, "common pad pad"), (5L, "pad pad pad"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bm25(docs, "doc_id", "text",
        Seq("rare", "common"), k1, b)
      .collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("score_micros")).toMap
    assert(got(1L) > got(2L), "idf must reward the rarer term")
    assert(got(2L) == got(3L) && got(3L) == got(4L),
      "identical tf/df/dl score identically")
  }

  test("multi-term hits sum and count") {
    val docs = Seq((1L, "x y"), (2L, "x z"), (3L, "w w"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bm25(docs, "doc_id", "text", Seq("x", "y"))
      .collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("n_terms_hit")).toMap
    assert(got == Map(1L -> 2L, 2L -> 1L))
  }
}
