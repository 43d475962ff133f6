package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[TextAnalysis.ngramContamination]] — benchmark decontamination:
  * planted-overlap hand-math, clean-doc absence, worst-item argmax
  * tie-break, multi-bench-sharing, and partition independence. */
class DecontamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def run(corpus: Seq[(Long, String)], bench: Seq[(Long, String)],
                  n: Int = 3): Map[Long, (Long, Long, Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    TextAnalysis.ngramContamination(
        corpus.toDF("doc_id", "text"), "doc_id", "text",
        bench.toDF("doc_id", "text"), "doc_id", "text", n)
      .collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_hits"), r.getAs[Long]("total_grams"),
          r.getAs[Long]("contamination_micros"),
          r.getAs[Long]("worst_bench_id"), r.getAs[Long]("worst_overlap"))))
      .toMap
  }

  test("planted overlap: exact hit counts and ratio; clean docs absent") {
    val bench = Seq(100L -> "the quick brown fox jumps")
    // doc 1 contains "quick brown fox" and "brown fox jumps" (2 of the
    // bench's 3 distinct 3-grams) among its own 4 distinct 3-grams;
    // doc 2 shares nothing
    val corpus = Seq(
      1L -> "a quick brown fox jumps high",
      2L -> "totally unrelated words entirely here")
    val got = run(corpus, bench)
    assert(got.keySet == Set(1L))
    val (hits, total, micros, wb, wo) = got(1L)
    assert(hits == 2L && total == 4L)
    assert(micros == 500000L) // floor(2/4 * 1e6 + .5)
    assert(wb == 100L && wo == 2L)
  }

  test("worst-bench argmax: most shared grams wins, ties to smaller id") {
    val bench = Seq(
      10L -> "alpha beta gamma delta", // grams: a b g, b g d
      20L -> "alpha beta gamma",       // gram:  a b g
      30L -> "alpha beta gamma")       // gram:  a b g (tie with 20)
    val corpus = Seq(1L -> "alpha beta gamma delta epsilon")
    val got = run(corpus, bench)
    // doc 1 shares 2 grams with bench 10, 1 with 20, 1 with 30
    val (hits, _, _, wb, wo) = got(1L)
    assert(hits == 2L && wb == 10L && wo == 2L)
    // remove bench 10: 20 and 30 tie at 1 — smaller id wins
    val got2 = run(corpus, bench.filterNot(_._1 == 10L))
    assert(got2(1L)._4 == 20L && got2(1L)._5 == 1L)
  }

  test("a gram shared with several bench docs counts once in n_hits") {
    val bench = Seq(10L -> "x y z", 20L -> "x y z")
    val corpus = Seq(1L -> "w x y z")
    val (hits, total, _, wb, _) = run(corpus, bench)(1L)
    assert(hits == 1L && total == 2L && wb == 10L)
  }

  test("short documents (< n tokens) produce no grams on either side") {
    val got = run(Seq(1L -> "one two"), Seq(10L -> "one two"))
    assert(got.isEmpty)
  }

  test("deterministic under repartitioning") {
    val s = spark
    import s.implicits._
    val corpus = (25L until 200L).map(i =>
      i -> s"tok${i % 7} tok${(i + 1) % 7} tok${(i + 2) % 7} tok${i % 5}")
    val bench = (0L until 25L).map(i =>
      i -> s"tok${i % 7} tok${(i + 1) % 7} tok${(i + 2) % 7}")
    def go(parts: Int) = TextAnalysis.ngramContamination(
        corpus.toDF("doc_id", "text").repartition(parts), "doc_id", "text",
        bench.toDF("doc_id", "text").repartition(parts), "doc_id", "text", 3)
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("n_hits"),
        r.getAs[Long]("worst_bench_id")))
      .sortBy(_._1).toSeq
    assert(go(2) == go(9))
    assert(go(2).nonEmpty)
  }
}
