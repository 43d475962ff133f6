package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[TextAnalysis.groupTermLift]] — distinctive terms per group:
  * hand-math lifts, ranking and tie-breaks, the support floor, and
  * top-k truncation. */
class GroupTermLiftSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(docs: Seq[(String, String)], minTc: Long, topK: Int) =
    TextAnalysis.groupTermLift(docs.toDF("grp", "text"), "grp", "text",
        minTc, topK)
      .collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[Long]("rnk")) ->
        ((r.getAs[String]("term"), r.getAs[Long]("n_tc"),
          r.getAs[Long]("n_t"), r.getAs[Long]("lift_micros"))))
      .toMap

  test("hand math: lift ranks the group-specific term first") {
    // A: x x y | B: y y z -> N=6, n_x=2, n_y=3, n_z=1, n_cA=n_cB=3
    val got = run(Seq("A" -> "x x y", "B" -> "y y z"), 1L, 2)
    // lift(A,x) = 2*6e6/(3*2) = 2e6; lift(A,y) = 1*6e6/9 = 666666
    assert(got(("A", 1L)) === (("x", 2L, 2L, 2000000L)))
    assert(got(("A", 2L)) === (("y", 1L, 3L, 666666L)))
    // lift(B,z) = 1*6e6/3 = 2e6; lift(B,y) = 2*6e6/9 = 1333333
    assert(got(("B", 1L)) === (("z", 1L, 1L, 2000000L)))
    assert(got(("B", 2L)) === (("y", 2L, 3L, 1333333L)))
  }

  test("equal lift ties break lexicographically") {
    val got = run(Seq("C" -> "p q"), 1L, 2)
    assert(got(("C", 1L))._1 === "p" && got(("C", 2L))._1 === "q")
    assert(got(("C", 1L))._4 === got(("C", 2L))._4)
  }

  test("support floor drops rare terms before ranking") {
    val got = run(Seq("A" -> "x x y", "B" -> "y y z"), 2L, 5)
    // only terms with n_tc >= 2 survive: (A,x) and (B,y)
    assert(got.keySet === Set(("A", 1L), ("B", 1L)))
    assert(got(("A", 1L))._1 === "x" && got(("B", 1L))._1 === "y")
  }

  test("top-k truncates per group independently") {
    val got = run(Seq("A" -> "a b c d", "B" -> "e"), 1L, 2)
    assert(got.keys.count(_._1 == "A") === 2)
    assert(got.keys.count(_._1 == "B") === 1)
  }

  test("tokenization lower-cases (parity with the oracle regex)") {
    val got = run(Seq("A" -> "FOO foo"), 1L, 1)
    assert(got(("A", 1L))._2 === 2L) // FOO and foo collapse
  }
}
