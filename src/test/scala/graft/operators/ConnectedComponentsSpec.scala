package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("label propagation finds exact components (chain, triangle, isolated pair)") {
    val s = spark
    import s.implicits._
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L)).toDF("i", "j")
    val got = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("iteration does not leak cached tables (only the returned labels stay)") {
    val s = spark
    import s.implicits._
    // a long path forces many rounds — each one localCheckpoints a
    // label table; superseded rounds must be RELEASED, or a long-lived
    // driver accumulates one dead block set per round per invocation
    val pairs = (50L until 70L).map(i => (i, i + 1)).toDF("i", "j")
    val before = spark.sparkContext.getPersistentRDDs.size
    val labels = Dedup.connectedComponents(pairs)
    assert(labels.count() == 21)
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before <= 1,
      s"CC left ${after - before} persistent RDDs behind (want <= 1: the result)")
  }

  test("pointer-jumping converges a diameter-80 path inside maxIter") {
    val s = spark
    import s.implicits._
    // an 81-node path needs 80 one-hop rounds — beyond maxIter = 50 —
    // so this passes only because each round ALSO pointer-jumps
    // (follow the label's own label), which makes rounds O(log
    // diameter). Exactness is unchanged: same min-label fixpoint.
    val pairs = (200L until 280L).map(i => (i, i + 1)).toDF("i", "j")
    val got = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(200L))
    assert(got.keySet == (200L to 280L).toSet)
  }

  test("long path converges to the true minimum (diameter > 1 iteration)") {
    val s = spark
    import s.implicits._
    // path 100-99-98-...-90: min label must propagate the full length
    val pairs = (90L until 100L).map(i => (i, i + 1)).toDF("i", "j")
    val got = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(90L))
    assert(got.keySet == (90L to 100L).toSet)
  }
}
