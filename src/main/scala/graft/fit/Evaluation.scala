package graft.fit

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-quality operators (absent from the reference, which fits and
  * prints rules with no train/test split or scoring — SURVEY.md §0):
  * deterministic splits, confusion matrix, accuracy. All single-shuffle
  * aggregations over the scored DataFrame. */
object Evaluation {

  /** Deterministic train/test split on a hash of the key columns —
    * reproducible across runs and engines (unlike randomSplit, which
    * depends on partitioning). `testFraction` of the hash space goes to
    * test. */
  def hashSplit(df: DataFrame, keyCol: String, testFraction: Double,
                salt: Int = 0): (DataFrame, DataFrame) = {
    val bucket = pmod(hash(col(keyCol), lit(salt)), lit(1000))
    val cut = (testFraction * 1000).toInt
    (df.filter(bucket >= cut), df.filter(bucket < cut))
  }

  /** (actual, predicted, cnt) — one row per label pair present. */
  def confusionMatrix(scored: DataFrame, labelCol: String,
                      predCol: String = "prediction"): DataFrame =
    scored.groupBy(col(labelCol).as("actual"), col(predCol).as("predicted"))
      .agg(count(lit(1)).as("cnt"))

  def accuracy(scored: DataFrame, labelCol: String,
               predCol: String = "prediction"): Double = {
    val r = scored.agg(
      sum(when(col(labelCol) === col(predCol), 1L).otherwise(0L)).as("hit"),
      count(lit(1)).as("n")).collect()(0)
    r.getLong(0).toDouble / r.getLong(1)
  }
}
