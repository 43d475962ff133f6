package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys at cluster scale. AQE's skew-join
  * handling covers sort-merge joins automatically; these utilities
  * cover the remaining cases — a broadcast-ineligible join against a
  * replicable right side, and high-cardinality-per-key aggregations —
  * with deterministic salting so results stay reproducible.
  *
  * saltedJoin: left rows get a deterministic salt in [0, nSalts) from
  * a hash of the whole row's key + a disambiguator column; the right
  * side is replicated nSalts times. The join key becomes (key, salt),
  * splitting each hot key's rows across nSalts reducers.
  *
  * twoPhaseAgg: count/sum-style aggregations regroup by (key, salt)
  * first (shards a hot key across partitions), then re-aggregate by
  * key. Spark's partial aggregation already does this when the map
  * side sees all values of a key; twoPhaseAgg also covers the case
  * where upstream partitioning concentrates one key in few tasks. */
object SkewTools {

  /** Deterministic salt in [0, nSalts) derived from arbitrary columns
    * (use a unique id / all columns so the split is even). */
  def salt(nSalts: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(nSalts))

  /** Inner equi-join with a salted left side and an nSalts-times
    * replicated right side. `leftDisambig` should be ~unique per left
    * row (e.g. its primary key) so hot-key rows spread evenly. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 leftDisambig: String, nSalts: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      salt(nSalts, col(key), col(leftDisambig)))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase count/sum aggregation by `key`: phase 1 groups by
    * (key, salt-of-disambiguator), phase 2 merges the shards. */
  def twoPhaseCountSum(df: DataFrame, key: String, valueCol: String,
                       disambig: String, nSalts: Int): DataFrame =
    df.withColumn("__salt", salt(nSalts, col(disambig)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__c"), sum(col(valueCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum("__c").as("cnt"), sum("__s").as("sum_value"))
}
