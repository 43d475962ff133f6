package graft.fit

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Calibration / reliability table of a score against a boolean
    * label: rows bucket into `bins` score-quantile bins (edges =
    * exact interior percentiles, so bucketing is deterministic and
    * engine-portable), and each bin reports its size, positive count
    * and positive rate plus the DECIMAL-summed mean score — is a
    * higher score actually a higher keep rate, and where does the
    * signal flatten? The companion to [[binaryAuc]]: AUC summarizes
    * ranking in one number, the reliability table shows its shape.
    *
    * Scale shape: one percentile aggregation for the bin edges (an
    * array in a 1-row broadcast), one codegen'd fold per row to
    * bucket, one partial-agg rollup to `bins` rows. Mean scores sum
    * as DECIMAL(18,6) so the result is partition-order independent.
    * Output: (bin, n, n_pos, pos_rate, mean_score), bin 0 = lowest
    * scores. */
  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: String,
                      bins: Int = 10): DataFrame = {
    require(bins >= 2, "need at least 2 bins")
    val probs = (1 until bins).map(_.toDouble / bins).toArray
    val edges = df.agg(percentile(col(scoreCol),
      typedLit(probs)).as("__edges"))
    df.select(col(scoreCol).as("__s"),
        when(col(labelCol), 1L).otherwise(0L).as("__p"))
      .crossJoin(broadcast(edges))
      .select(aggregate(col("__edges"), lit(0),
          (acc, e) => acc + when(col("__s") > e, 1).otherwise(0)).as("bin"),
        col("__s"), col("__p"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("__p")).as("n_pos"),
        sum(col("__s").cast("decimal(18,6)")).as("__sum"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n"), 6).as("pos_rate"),
        round(col("__sum").cast("double") / col("n"), 6).as("mean_score"))
  }

  /** Exact ROC-AUC of a score against a boolean label — the
    * Mann-Whitney U statistic, EXACT including ties (a tied
    * positive/negative pair counts ½).
    *
    * The naive formulation is a global rank over every row (a
    * single-partition window — the anti-pattern). Instead the
    * statistic factors over the DISTINCT-SCORE table:
    *
    *   2·U = Σ_s  nPos(s) · ( 2·cumNeg(<s) + nNeg(s) )
    *
    * so the only ordered pass is a running sum over distinct scores —
    * bounded by score cardinality, not row count (scores here are
    * 6dp-quantized pipeline signals; a million distinct values is a
    * small window input where the corpus is not). Everything else is
    * one partial-agg groupBy of the corpus. 2·U stays an exact
    * integer — no float rank arithmetic — and AUC = 2U / (2·nPos·nNeg)
    * rounds once at 6dp for the cross-engine pin.
    *
    * Output: one row (n_pos, n_neg, u2, auc). Degenerate inputs (no
    * positives or no negatives) yield u2 = 0 and auc = NULL. */
  def binaryAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val perScore = df
      .select(col(scoreCol).as("s"),
        when(col(labelCol), 1L).otherwise(0L).as("p"))
      .groupBy("s")
      .agg(sum(col("p")).as("np"), sum(lit(1L) - col("p")).as("nn"))
    val w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    perScore
      .withColumn("cum_nn", coalesce(sum(col("nn")).over(w), lit(0L)))
      .agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
        sum(col("np") * (lit(2L) * col("cum_nn") + col("nn"))).as("u2"))
      .select(col("n_pos"), col("n_neg"), col("u2"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("u2").cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg")), 6)).as("auc"))
  }
}
