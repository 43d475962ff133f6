package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[TextAnalysis.bpeTrain]] — relational BPE merge training:
  * hand-traced merges on a classic corpus, the overlapping-pair
  * application rule, dry-out behavior, and determinism. */
class BpeTrainSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def train(texts: Seq[String], n: Int) =
    TextAnalysis.bpeTrain(texts.zipWithIndex.map(_.swap).toDF("id", "text"),
        "text", n)
      .collect()
      .map(r => (r.getAs[Int]("merge_rank"), r.getAs[String]("lhs"),
        r.getAs[String]("rhs"), r.getAs[Long]("pair_freq")))

  test("hand-traced merges on the classic low/lower/lowest corpus") {
    // word freqs: low ×3, lower ×2, lowest ×1; 6 words total.
    // pair counts round 1: (l,o)=6, (o,w)=6, (w,e)=3, (e,r)=2, (e,s)=1,
    // (s,t)=1 — argmax ties (l,o) vs (o,w) at 6, lexicographic lhs
    // breaks to (l,o). Round 2: (lo,w)=6 wins. Round 3: (low,e)=3.
    val corpus = Seq("low low lower", "low lower lowest")
    val got = train(corpus, 3)
    assert(got(0) == ((1, "l", "o", 6L)))
    assert(got(1) == ((2, "lo", "w", 6L)))
    assert(got(2) == ((3, "low", "e", 3L)))
  }

  test("greedy left-to-right application: overlapping pairs merge non-overlapping") {
    // 'aaaa' ×1: round-1 pairs (a,a)=3 -> merge 'aa'. Greedy
    // application gives [aa, aa] (NOT [a, aa, a]); round 2 must see
    // (aa,aa)=1 as the only remaining pair in that word.
    val got = train(Seq("aaaa bb"), 3)
    assert(got(0)._2 == "a" && got(0)._3 == "a" && got(0)._4 == 3L)
    // (aa,aa)=1 ties with (b,b)=1; lexicographic lhs 'aa' < 'b'
    assert(got(1) == ((2, "aa", "aa", 1L)))
    // round 3: only (b,b) remains ('aaaa' is one symbol now)
    assert(got(2) == ((3, "b", "b", 1L)))
  }

  test("runs dry when no adjacent pairs remain, returning fewer merges") {
    // single-char words only -> zero pairs from round 1
    val got = train(Seq("a b c a"), 5)
    assert(got.isEmpty)
    // 'ab' exhausts after one merge
    val got2 = train(Seq("ab ab"), 5)
    assert(got2.length == 1 && got2.head == ((1, "a", "b", 2L)))
  }

  test("bpeApply: token counts follow the merge table in rank order") {
    val d = Seq((0L, "low lower")).toDF("id", "text")
    // no merges: character tokens
    val none = TextAnalysis.bpeApply(d, "id", "text", Nil).collect().head
    assert(none.getAs[Long]("n_tokens") == 8) // l o w + l o w e r
    // (l,o) then (lo,w): low -> [low]; lower -> [low, e, r]
    val got = TextAnalysis.bpeApply(d, "id", "text",
      Seq(("l", "o"), ("lo", "w"))).collect().head
    assert(got.getAs[Long]("n_tokens") == 4)
  }

  test("bpeApply: merges never cross word boundaries") {
    val d = Seq((0L, "aw la")).toDF("id", "text")
    // pattern ' w  l ' must not bridge 'aw' and 'la' (3-space gap)
    val got = TextAnalysis.bpeApply(d, "id", "text", Seq(("w", "l")))
      .collect().head
    assert(got.getAs[Long]("n_tokens") == 4)
  }

  test("deterministic on the real corpus, and ranks are 1..n") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def run() = TextAnalysis.bpeTrain(docs, "text", 5)
      .collect()
      .map(r => (r.getAs[Int]("merge_rank"), r.getAs[String]("lhs"),
        r.getAs[String]("rhs"), r.getAs[Long]("pair_freq"))).toSeq
    val a = run()
    assert(a.map(_._1) == (1 to 5))
    assert(a == run())
  }
}
