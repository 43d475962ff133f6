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

  test("binaryAuc: hand cases — perfect, inverted, random, and ties count half") {
    val s = spark
    import s.implicits._
    def auc(rows: Seq[(Double, Boolean)]): (Long, Long, Long, Option[Double]) = {
      val r = Evaluation.binaryAuc(rows.toDF("sc", "lab"), "sc", "lab")
        .collect().head
      (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"), r.getAs[Long]("u2"),
        if (r.isNullAt(r.fieldIndex("auc"))) None
        else Some(r.getAs[Double]("auc")))
    }
    // perfect separation: every positive above every negative
    assert(auc(Seq((1.0, false), (2.0, false), (3.0, true), (4.0, true))) ==
      ((2L, 2L, 8L, Some(1.0))))
    // inverted: AUC 0
    assert(auc(Seq((3.0, false), (4.0, false), (1.0, true), (2.0, true)))._4
      .contains(0.0))
    // all scores tied: every pos/neg pair counts half -> 0.5
    assert(auc(Seq((5.0, true), (5.0, false), (5.0, true), (5.0, false))) ==
      ((2L, 2L, 4L, Some(0.5))))
    // one class only -> u2 0, auc NULL
    assert(auc(Seq((1.0, true), (2.0, true))) == ((2L, 0L, 0L, None)))
  }

  test("binaryAuc matches the naive pairwise count on a random-ish mix") {
    val s = spark
    import s.implicits._
    val rows = (1 to 200).map { i =>
      val sc = (i * 37 % 50).toDouble // deliberate heavy ties
      val lab = (i * 13 % 3) == 0
      (sc, lab)
    }
    val r = Evaluation.binaryAuc(rows.toDF("sc", "lab"), "sc", "lab")
      .collect().head
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val u2 = (for (p <- pos; n <- neg) yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum
    assert(r.getAs[Long]("u2") == u2)
    assert(r.getAs[Double]("auc") ==
      math.rint(u2.toDouble / (2.0 * pos.length * neg.length) * 1e6) / 1e6)
  }
}
