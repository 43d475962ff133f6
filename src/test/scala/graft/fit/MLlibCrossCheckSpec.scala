package graft.fit

import graft.{Fixtures, SparkTestSession}
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.DecisionTreeClassifier
import org.apache.spark.ml.feature.{StringIndexer, VectorAssembler}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §5.4: MLlib cross-check. MLlib's DecisionTreeClassifier
  * (entropy impurity) is not rule-identical to C4.5 (info gain vs gain
  * ratio, binary splits, binning) but must be accuracy-comparable on
  * the same data — guards against a systematically broken fit. */
class MLlibCrossCheckSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("graft C4.5 training accuracy is comparable to MLlib entropy tree") {
    val df = Fixtures.tennis(spark)

    val ours = C45.fit(df, Fixtures.tennisSchema)
    val oursAcc = {
      val scored = ours.transform(df)
      scored.filter(col("prediction") === col("play")).count().toDouble / df.count()
    }

    val pipeline = new Pipeline().setStages(Array(
      new StringIndexer().setInputCol("outlook").setOutputCol("outlook_i"),
      new StringIndexer().setInputCol("windy").setOutputCol("windy_i"),
      new StringIndexer().setInputCol("play").setOutputCol("label"),
      new VectorAssembler()
        .setInputCols(Array("outlook_i", "temperature", "humidity", "windy_i"))
        .setOutputCol("features"),
      new DecisionTreeClassifier().setImpurity("entropy").setSeed(42)))
    val m = pipeline.fit(df)
    val mllibAcc = {
      val scored = m.transform(df)
      scored.filter(col("prediction") === col("label")).count().toDouble / df.count()
    }

    assert(oursAcc == 1.0) // fully-grown tree memorizes the 14 rows
    assert(mllibAcc >= 0.85, s"mllib acc $mllibAcc")
    assert(math.abs(oursAcc - mllibAcc) <= 0.15)
  }
}
