package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[Assoc.pairLift]] — size-2 A-priori with exact integer lift:
  * hand math, the prune's no-op guarantee on the result, support
  * floors, and partitioning determinism. */
class AssocSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(m: Seq[(Long, String)], minItem: Long, minPair: Long) =
    Assoc.pairLift(m.toDF("b", "it"), "b", "it", minItem, minPair)
      .collect().map(r => (r.getAs[String]("item1"), r.getAs[String]("item2")) ->
        ((r.getAs[Long]("n_ab"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("lift_micros")))).toMap

  test("hand math: supports, pair counts, and exact lift") {
    // b1{a,b,c} b2{a,b} b3{a,c} b4{a}: B=4, sup a=4 b=2 c=2;
    // (a,b)=2 (a,c)=2 (b,c)=1
    val m = Seq(1L -> "a", 1L -> "b", 1L -> "c", 2L -> "a", 2L -> "b",
      3L -> "a", 3L -> "c", 4L -> "a")
    val got = run(m, minItem = 1L, minPair = 2L)
    assert(got.keySet == Set(("a", "b"), ("a", "c")))
    // lift = 2*4*1e6 / (4*2) = 1e6 — exactly independence
    assert(got(("a", "b")) == ((2L, 4L, 2L, 1000000L)))
    assert(got(("a", "c")) == ((2L, 4L, 2L, 1000000L)))
  }

  test("lift above and below independence, exact division") {
    // b and c ALWAYS co-occur (lift > 1); a is everywhere (lift = 1
    // with b); B=6
    val m = Seq[(Long, String)](
      1L -> "a", 1L -> "b", 1L -> "c", 2L -> "a", 2L -> "b", 2L -> "c",
      3L -> "a", 4L -> "a", 5L -> "a", 6L -> "a")
    val got = run(m, 1L, 2L)
    // (b,c): n_ab=2, n_b=2, n_c=2 -> 2*6e6/4 = 3e6
    assert(got(("b", "c")) == ((2L, 2L, 2L, 3000000L)))
    // (a,b): 2*6e6/(6*2) = 1e6
    assert(got(("a", "b"))._4 == 1000000L)
  }

  test("A-priori item floor prunes pairs of rare items") {
    val m = Seq(1L -> "a", 1L -> "b", 2L -> "a", 2L -> "b", 3L -> "a")
    assert(run(m, minItem = 1L, minPair = 2L).contains(("a", "b")))
    assert(run(m, minItem = 3L, minPair = 2L).isEmpty) // sup(b)=2 < 3
  }

  test("the pair floor already implies the item prune (same result either way)") {
    val m = (1L to 40L).flatMap(b =>
      Seq(b -> s"x${b % 4}", b -> s"y${b % 6}", b -> s"z${b % 40}"))
    assert(run(m, minItem = 1L, minPair = 3L) ==
      run(m, minItem = 3L, minPair = 3L))
  }

  test("duplicate memberships are the caller's contract — counts stay presence-shaped after distinct") {
    val m = Seq(1L -> "a", 1L -> "b", 2L -> "a", 2L -> "b")
    val dup = (m ++ m).toDF("b", "it").distinct()
    val got = Assoc.pairLift(dup, "b", "it", 1L, 2L)
      .collect().map(r => (r.getAs[Long]("n_ab"), r.getAs[Long]("lift_micros")))
    assert(got.toSeq == Seq((2L, 1000000L)))
  }

  test("deterministic under repartitioning") {
    val m = (1L to 60L).flatMap(b => (0L to b % 5).map(i => b -> s"it$i"))
    def go(parts: Int) = Assoc.pairLift(
        m.toDF("b", "it").repartition(parts), "b", "it", 2L, 2L)
      .collect().map(r => (r.getAs[String]("item1"), r.getAs[String]("item2"),
        r.getAs[Long]("n_ab"), r.getAs[Long]("lift_micros")))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(go(2) == go(9))
  }
}
