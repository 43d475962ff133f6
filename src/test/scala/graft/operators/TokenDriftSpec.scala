package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[TextAnalysis.tokenDrift]] — smoothed odds-ratio drift between
  * two corpus sides: hand math, the symmetric no-drift case, one-sided
  * tokens, the min-count floor, and partitioning determinism. */
class TokenDriftSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], minCount: Long = 1L) =
    TextAnalysis.tokenDrift(
        docs.toDF("doc_id", "text"), "text",
        col("doc_id") % 2 === 0, minCount)
      .collect().map(r => r.getAs[String]("term") ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("or_micros")))).toMap

  test("hand math: one over-represented and one symmetric token") {
    // side A (even ids): "x x y"; side B: "y y y"
    val got = run(Seq(2L -> "x x y", 3L -> "y y y"))
    // x: a=2 b=0; y: a=1 b=3; tA=3 tB=3
    // or(x) = (3 * (3-0+1)) / (1 * (3-2+1)) = 12/2 = 6
    assert(got("x") == ((2L, 0L, 6000000L)))
    // or(y) = (2 * 1) / (4 * 3) = 2/12 -> 166666
    assert(got("y") == ((1L, 3L, 166666L)))
  }

  test("identical sides drift to exactly 1e6 everywhere") {
    val got = run(Seq(0L -> "u v u w", 1L -> "u v u w"))
    got.values.foreach { case (a, b, or) =>
      assert(a == b && or == 1000000L)
    }
  }

  test("min-count floor drops rare tokens from the report") {
    val got = run(Seq(0L -> "common common rare", 1L -> "common common"),
      minCount = 3L)
    assert(got.keySet == Set("common"))
  }

  test("tokens are lowercased before siding (one row per folded term)") {
    val got = run(Seq(0L -> "Tok tok", 1L -> "TOK"))
    assert(got.keySet == Set("tok"))
    // a=2 b=1, tA=2 tB=1: or = (3*1)/(2*1) = 1.5
    assert(got("tok") == ((2L, 1L, 1500000L)))
  }

  test("deterministic under repartitioning") {
    val docs = (0L until 80L).map(i =>
      i -> (0 to (i % 7).toInt).map(k => s"w${(i * 13 + k * 7) % 23}").mkString(" "))
    def go(parts: Int) = TextAnalysis.tokenDrift(
        docs.toDF("doc_id", "text").repartition(parts), "text",
        col("doc_id") % 2 === 0, 2L)
      .collect().map(r => (r.getAs[String]("term"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"), r.getAs[Long]("or_micros")))
      .sortBy(_._1).toSeq
    assert(go(2) == go(9))
  }
}
