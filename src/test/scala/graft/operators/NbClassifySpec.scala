package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[TextAnalysis.nbClassify]] — relational multinomial Naive Bayes:
  * hand-computed toy scores, separable-corpus recovery, unseen-token
  * prior fallback, and partition independence of the exact micros. */
class NbClassifySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  private val toy = Seq(
    (1L, "cat cat dog", "pets"),
    (2L, "cat fish", "pets"),
    (3L, "bond stock stock", "finance"),
    (4L, "stock fund", "finance")
  )

  test("toy corpus: exact hand-computed score micros and labels") {
    val d = toy.toDF("id", "text", "lab")
    val got = TextAnalysis.nbClassify(d, d, "id", "text", "lab")
      .collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("pred"), r.getAs[Long]("score_micros"))).toMap
    // model: V = 6 (cat dog fish bond stock fund); C_pets = 5,
    // C_finance = 5; priors ln(2/4) both. Replay the operator's exact
    // formula: score = prior - len*ln(C_l+V) + sum c*ln(c_lt+1),
    // every piece rounded half-up to micros exactly as documented.
    def m(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    val prior = m(math.log(0.5))
    val denom = math.log(11.0) // both labels: C_l + V = 11
    def score(len: Int, seen: Seq[(Int, Int)]): Long =
      prior - m(len * denom) + seen.map { case (c, clt) =>
        m(c * math.log(clt + 1.0)) }.sum
    // doc 1 "cat cat dog" under pets: cat c=2 c_lt=3, dog c=1 c_lt=1
    assert(got(1L) == ("pets",
      score(3, Seq((2, 3), (1, 1)))))
    // doc 3 "bond stock stock" under finance: bond 1/1, stock 2/3
    assert(got(3L) == ("finance",
      score(3, Seq((1, 1), (2, 3)))))
    assert(got(2L)._1 == "pets" && got(4L)._1 == "finance")
  }

  test("docs of only unseen tokens fall back to the prior argmax, smallest label on ties") {
    val train = toy.toDF("id", "text", "lab")
    val scoreDocs = Seq((100L, "quux zorp")).toDF("id", "text")
    val got = TextAnalysis
      .nbClassify(train, scoreDocs, "id", "text", "lab").collect()
    assert(got.length == 1)
    // equal priors and equal denominators -> tie -> smallest label
    assert(got.head.getAs[String]("pred") == "finance")
  }

  test("real corpus: one row per doc, in-sample accuracy beats the majority baseline") {
    // the synthetic corpus's text is the same token soup under every
    // lang label (TESTDATA is not language-derived), so NB cannot
    // RECOVER lang here — the toy test above proves recovery on
    // separable data. What the real corpus does pin: full coverage
    // and that the trained scores still beat always-majority (the
    // classifier learns doc-specific token quirks, it never does
    // worse than its own prior).
    val d = docs
    val scored = TextAnalysis.nbClassify(d, d, "doc_id", "text", "lang")
      .join(d.select(col("doc_id").as("id"), col("lang")), "id")
    val n = scored.count()
    assert(n == d.count())
    val hit = scored.filter(col("pred") === col("lang")).count()
    val majority = d.groupBy("lang").count()
      .agg(max("count")).as[Long].head()
    assert(hit >= majority,
      s"NB in-sample $hit/$n must be >= majority baseline $majority/$n")
  }

  test("scores are partition-independent exact longs") {
    val d = docs
    def run(df: org.apache.spark.sql.DataFrame): Map[Long, (String, Long)] =
      TextAnalysis.nbClassify(df, df, "doc_id", "text", "lang")
        .collect()
        .map(r => r.getAs[Long]("id") ->
          (r.getAs[String]("pred"), r.getAs[Long]("score_micros"))).toMap
    assert(run(d) == run(d.repartition(7)))
  }
}
