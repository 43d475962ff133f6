package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[Dedup.containmentPairs]] — asymmetric containment: the
  * low-Jaccard/high-containment case, support floor, df cap, and
  * post-cap size accounting. */
class ContainmentSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], minShared: Long,
                  thr: Long, cap: Long = 0L) =
    Dedup.containmentPairs(docs.toDF("doc_id", "text"), "doc_id", "text",
        n = 1, minShared = minShared, contMicrosThreshold = thr,
        maxShingleDf = cap)
      .collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j")) ->
        ((r.getAs[Long]("n_shared"), r.getAs[Long]("sz_i"),
          r.getAs[Long]("sz_j"), r.getAs[Long]("cont_micros"))))
      .toMap

  test("catches doc-inside-doc that Jaccard misses") {
    // doc 1 fully contained in doc 2: J = 3/10 = 0.3, containment = 1
    val docs = Seq(
      1L -> "a b c",
      2L -> "a b c d e f g h i j")
    val got = run(docs, minShared = 1L, thr = 800000L)
    assert(got === Map((1L, 2L) -> ((3L, 3L, 10L, 1000000L))))
  }

  test("partial containment computes against the SMALLER set") {
    // 4 of doc 1's 5 tokens inside doc 2 -> 800000 exactly
    val docs = Seq(1L -> "a b c d e", 2L -> "a b c d x y z w q")
    val got = run(docs, 1L, 800000L)
    assert(got((1L, 2L)) === ((4L, 5L, 9L, 800000L)))
    // threshold just above excludes it
    assert(run(docs, 1L, 800001L).isEmpty)
  }

  test("minShared floors out trivia pairs before sizes join") {
    val docs = Seq(1L -> "a b", 2L -> "a b", 3L -> "q r s t u v w x y z")
    assert(run(docs, 3L, 500000L).isEmpty)
    assert(run(docs, 2L, 500000L).keySet === Set((1L, 2L)))
  }

  test("df cap drops boilerplate tokens from sets AND sizes") {
    // "the" appears in all 3 docs; cap 2 removes it everywhere
    val docs = Seq(1L -> "the a b", 2L -> "the a b", 3L -> "the z")
    val got = run(docs, 1L, 500000L, cap = 2L)
    // post-cap: doc1 = {a,b}, doc2 = {a,b}, doc3 = {z}
    assert(got === Map((1L, 2L) -> ((2L, 2L, 2L, 1000000L))))
  }

  test("guards fail loudly") {
    val df = Seq(1L -> "a").toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.containmentPairs(df, "doc_id", "text", 1, 0L, 500000L)
    }
    intercept[IllegalArgumentException] {
      Dedup.containmentPairs(df, "doc_id", "text", 1, 1L, 1000001L)
    }
  }
}
