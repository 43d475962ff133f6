package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Exact per-group top-k as a general operator, backed by the same
  * k-bounded partial-combining [[TopKAggregator]] the ANN rankers use.
  *
  * The textbook formulation — `row_number() OVER (PARTITION BY key
  * ORDER BY score)` then `WHERE rn <= k` — serializes EVERY row of a
  * group into one partition before ranking: one hot key (a celebrity
  * user, a head domain) becomes one straggler task holding the whole
  * group. Here the aggregate's buffer is capped at k and merges
  * associatively, so map-side partial aggregation trims each partition
  * to ≤ k rows per key before the exchange — the shuffle carries
  * O(k × keys) rows no matter how skewed the groups are, and the
  * result is identical (ordering is total: score desc, id asc, so the
  * outcome is independent of partitioning and arrival order).
  *
  * `scoreCol` must be pre-rounded by the caller — ties break on id, so
  * the score order must be exact for determinism (same contract as the
  * ANN rankers). */
object GroupTopK {

  /** (key, rank, id, score) with rank 1..k best-first per key. */
  def topKByKey(df: DataFrame, keyCol: Column, idCol: Column,
                scoreCol: Column, k: Int): DataFrame = {
    val agg = udaf(new TopKAggregator(k), Encoders.product[Scored])
    df.groupBy(keyCol.as("key"))
      .agg(agg(scoreCol.cast("double"), idCol.cast("long")).as("h"))
      .select(col("key"),
        posexplode(arrays_zip(col("h.score").as("score"), col("h.id").as("id"))))
      .select(col("key"), (col("pos") + 1).as("rank"),
        col("col.id").as("id"), col("col.score").as("score"))
  }
}
