package graft.fit

import graft.{Fixtures, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

class EvaluationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("accuracy + confusion matrix agree on the fully-grown tennis tree") {
    val m = C45.fit(Fixtures.tennis(spark), Fixtures.tennisSchema)
    val scored = m.transform(Fixtures.tennis(spark))
    assert(Evaluation.accuracy(scored, "play") == 1.0)
    val cm = Evaluation.confusionMatrix(scored, "play").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(cm == Map(("yes", "yes") -> 9L, ("no", "no") -> 5L))
  }

  test("hashSplit is deterministic, disjoint and covers the data") {
    val df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val (tr1, te1) = Evaluation.hashSplit(df, "o_orderkey", 0.3)
    val (tr2, te2) = Evaluation.hashSplit(df, "o_orderkey", 0.3)
    assert(tr1.count() == tr2.count() && te1.count() == te2.count())
    assert(tr1.count() + te1.count() == df.count())
    val frac = te1.count().toDouble / df.count()
    assert(frac > 0.2 && frac < 0.4, s"test fraction $frac")
    assert(tr1.join(te1, "o_orderkey").count() == 0) // disjoint
  }
}
