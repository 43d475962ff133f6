package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[Similarity.labelAgreement]] — bucketed kNN label agreement:
  * hand-math votes, k_actual capping, nearest-neighbor ranking,
  * singleton-cluster dropping, and the parameter guard. */
class LabelAgreementSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // cluster 0 around [1,0]: ids 1,2 label 0 and id 3 label 1;
  // cluster 1 around [0,1]: ids 4,5 label 1;
  // cluster 2 around [-1,0]: singleton id 6
  private val vecs = Seq(
    (1L, Seq(1.0, 0.0), 0), (2L, Seq(0.9, 0.1), 0), (3L, Seq(0.8, 0.2), 1),
    (4L, Seq(0.0, 1.0), 1), (5L, Seq(0.1, 0.9), 1), (6L, Seq(-1.0, 0.0), 0))
  private val cents = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)),
    (2L, Seq(-1.0, 0.0)))

  private def run(k: Int) =
    Similarity.labelAgreement(vecs.toDF("vec_id", "embedding", "label"),
        "vec_id", "embedding", "label", cents.toDF("cid", "cv"), k)
      .collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Int]("label"), r.getAs[Long]("k_actual"),
          r.getAs[Long]("n_agree"), r.getAs[Long]("agree_micros"))))
      .toMap

  test("hand math: votes, k_actual caps at cluster size - 1") {
    val got = run(5)
    // cluster 0: each member sees the other two
    assert(got(1L) === ((0, 2L, 1L, 500000L)))
    assert(got(2L) === ((0, 2L, 1L, 500000L)))
    assert(got(3L) === ((1, 2L, 0L, 0L))) // minority label: zero agreement
    // cluster 1: unanimous pair
    assert(got(4L) === ((1, 1L, 1L, 1000000L)))
    assert(got(5L) === ((1, 1L, 1L, 1000000L)))
  }

  test("singleton clusters are dropped, not slandered") {
    assert(!run(5).contains(6L))
  }

  test("k=1 takes the single nearest neighbor by cosine") {
    val got = run(1)
    // id3's nearest is id2 (cos 0.990999 > 0.970143 to id1): disagree
    assert(got(3L) === ((1, 1L, 0L, 0L)))
    // id1's nearest is id2: agree
    assert(got(1L) === ((0, 1L, 1L, 1000000L)))
  }

  test("guard: k must be positive") {
    intercept[IllegalArgumentException] {
      Similarity.labelAgreement(vecs.toDF("vec_id", "embedding", "label"),
        "vec_id", "embedding", "label", cents.toDF("cid", "cv"), 0)
    }
  }
}
