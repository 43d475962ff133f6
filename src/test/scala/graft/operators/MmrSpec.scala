package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[Similarity.mmrRerank]] — greedy maximal-marginal-relevance
  * selection: hand-math selection order (diversity beats redundancy),
  * the zero-clamped penalty, exhausted pools, per-query independence,
  * and parameter guards. */
class MmrSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(cands: Seq[(Long, Long, Double)],
                  vecs: Seq[(Long, Seq[Double])], k: Int, lam: Long) =
    Similarity.mmrRerank(cands.toDF("qid", "id", "cosine"),
        vecs.toDF("vec_id", "embedding"), "vec_id", "embedding", k, lam)
      .collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rank")) ->
        ((r.getAs[Long]("id"), r.getAs[Long]("rel_micros"),
          r.getAs[Long]("maxsim_micros"), r.getAs[Long]("score"))))
      .toMap

  test("hand math: diversity demotes the redundant twin") {
    // id1 and id2 are identical vectors (rel 1.0 each); id3 is the
    // diverse candidate at rel 0.6. Plain top-2 = {1, 2}; MMR at
    // lambda 0.4 = {1, 3}: after selecting 1, the twin's penalty
    // 0.6*1.0 dwarfs its 0.4*1.0 relevance.
    val vecs = Seq(1L -> Seq(1.0, 0.0), 2L -> Seq(1.0, 0.0),
      3L -> Seq(0.6, 0.8))
    val cands = Seq((0L, 1L, 1.0), (0L, 2L, 1.0), (0L, 3L, 0.6))
    val got = run(cands, vecs, k = 3, lam = 400000L)
    // round 1: argmax rel, tie on smaller id
    assert(got((0L, 1L)) === ((1L, 1000000L, 0L, 400000L * 1000000L)))
    // round 2: id3 wins (-1.2e11 > -2e11)
    assert(got((0L, 2L)) === ((3L, 600000L, 600000L,
      400000L * 600000L - 600000L * 600000L)))
    // round 3: the twin, carrying its full sim-1 penalty
    assert(got((0L, 3L)) === ((2L, 1000000L, 1000000L,
      400000L * 1000000L - 600000L * 1000000L)))
  }

  test("penalty is clamped at zero: anti-correlation is no bonus") {
    val vecs = Seq(1L -> Seq(1.0, 0.0), 2L -> Seq(-1.0, 0.0))
    val cands = Seq((0L, 1L, 1.0), (0L, 2L, -0.5))
    val got = run(cands, vecs, k = 2, lam = 500000L)
    // sim(2, 1) = -1 but maxsim stays clamped at 0
    assert(got((0L, 2L)) === ((2L, -500000L, 0L, 500000L * -500000L)))
  }

  test("pool exhaustion: fewer candidates than k stops cleanly") {
    val vecs = Seq(1L -> Seq(1.0, 0.0))
    val got = run(Seq((0L, 1L, 0.9)), vecs, k = 3, lam = 700000L)
    assert(got.size === 1)
    assert(got((0L, 1L))._1 === 1L)
  }

  test("queries advance independently, same rounds") {
    val vecs = Seq(1L -> Seq(1.0, 0.0), 2L -> Seq(0.0, 1.0))
    val cands = Seq((0L, 1L, 1.0), (0L, 2L, 0.5),
      (9L, 2L, 1.0), (9L, 1L, 0.5))
    val got = run(cands, vecs, k = 2, lam = 700000L)
    assert(got((0L, 1L))._1 === 1L && got((9L, 1L))._1 === 2L)
    // orthogonal runner-ups: no penalty, both selected second
    assert(got((0L, 2L))._1 === 2L && got((0L, 2L))._3 === 0L)
    assert(got((9L, 2L))._1 === 1L && got((9L, 2L))._3 === 0L)
  }

  test("parameter guards fail loudly") {
    val vecs = Seq(1L -> Seq(1.0))
    val cands = Seq((0L, 1L, 1.0)).toDF("qid", "id", "cosine")
    intercept[IllegalArgumentException] {
      Similarity.mmrRerank(cands, vecs.toDF("vec_id", "embedding"),
        "vec_id", "embedding", 0, 700000L)
    }
    intercept[IllegalArgumentException] {
      Similarity.mmrRerank(cands, vecs.toDF("vec_id", "embedding"),
        "vec_id", "embedding", 2, 1000001L)
    }
  }
}
