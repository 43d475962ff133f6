package graft.operators

import graft.SparkTestSession
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

/** [[Sessionize.transitionMatrix]] — per-user Markov steps: hand
  * math, sequence boundaries (no cross-user steps, singletons drop),
  * the (ts, id) tie-break, exact row normalization, and partitioning
  * determinism. */
class TransitionMatrixSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ev(rows: Seq[(Long, Long, Long, String)]) =
    rows.map { case (id, u, ms, t) => (id, u, new Timestamp(ms), t) }
      .toDF("event_id", "user_id", "ts", "event_type")

  private def run(rows: Seq[(Long, Long, Long, String)]) =
    Sessionize.transitionMatrix(ev(rows))
      .collect().map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_from"), r.getAs[Long]("p_micros"))))
      .toMap

  test("hand math: two users, counts and exact row probabilities") {
    // u1: view -> click -> view ; u2: view -> buy
    val got = run(Seq(
      (1L, 1L, 1000L, "view"), (2L, 1L, 2000L, "click"),
      (3L, 1L, 3000L, "view"),
      (4L, 2L, 1000L, "view"), (5L, 2L, 2000L, "buy")))
    assert(got.keySet ==
      Set(("view", "click"), ("click", "view"), ("view", "buy")))
    assert(got(("view", "click")) == ((1L, 2L, 500000L)))
    assert(got(("view", "buy")) == ((1L, 2L, 500000L)))
    assert(got(("click", "view")) == ((1L, 1L, 1000000L)))
  }

  test("no steps cross users; single-event users contribute nothing") {
    val got = run(Seq(
      (1L, 1L, 1000L, "a"), (2L, 2L, 2000L, "b"), (3L, 3L, 3000L, "c")))
    assert(got.isEmpty)
  }

  test("equal timestamps break ties by event_id (deterministic order)") {
    val got = run(Seq(
      (2L, 1L, 1000L, "late"), (1L, 1L, 1000L, "early")))
    assert(got.keySet == Set(("early", "late")))
  }

  test("per-from probabilities sum to ~1e6 (floor loss < fan-out)") {
    val types = Seq("a", "b", "c", "d")
    val rows = (0L until 120L).map(i =>
      (i, i % 7, 1000L + i * 97, types((i * 31 % 4).toInt)))
    val byFrom = run(rows).toSeq.groupBy(_._1._1)
    byFrom.foreach { case (f, cells) =>
      val total = cells.map(_._2._3).sum
      val nf = cells.head._2._2
      assert(cells.map(_._2._1).sum == nf, s"n_from mismatch for $f")
      assert(total <= 1000000L && total > 1000000L - cells.size,
        s"row $f sums to $total over ${cells.size} cells")
    }
  }

  test("deterministic under repartitioning") {
    val rows = (0L until 200L).map(i =>
      (i, i % 11, 1000L + (i * 37 % 90) * 1000L, s"t${i % 5}"))
    def go(parts: Int) = Sessionize.transitionMatrix(
        ev(rows).repartition(parts))
      .collect().map(r => (r.getAs[String]("from_type"),
        r.getAs[String]("to_type"), r.getAs[Long]("n"),
        r.getAs[Long]("p_micros")))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(go(2) == go(9))
  }
}
