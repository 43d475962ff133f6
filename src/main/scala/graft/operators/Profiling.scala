package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-profiling and monitoring operators: the checks a pipeline runs
  * BEFORE training on a new corpus drop (column distributions) and
  * AFTER each ingest (per-key time-series anomalies). The reference
  * has no profiling surface at all; these extend the engine the same
  * way the dedup/similarity operators do.
  *
  * Determinism discipline (both operators hash-match DuckDB oracles):
  * histogram bucket assignment is pure double arithmetic on exact
  * min/max; anomaly statistics accumulate DECIMAL sums (exact, any
  * order) and convert to double only for the final mean/σ/z math.
  */
object Profiling {

  /** Equi-width histogram per numeric column: `nBuckets` buckets over
    * the column's [min, max]; the max lands in the last bucket; a
    * constant column collapses to bucket 0. Scale shape: ONE global
    * agg for all columns' min/max (broadcast back), then one
    * partial-agg count per (column, bucket) — two scans total
    * (min/max + counts) regardless of column count, no window, no
    * driver-side data. */
  def numericHistogram(df: DataFrame, cols: Seq[String],
                       nBuckets: Int): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    require(cols.nonEmpty, "need at least one column")
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).cast("double").as(s"__mn_$c"),
      max(col(c)).cast("double").as(s"__mx_$c")))
    val mm = df.agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map { c =>
      val x = col(c).cast("double")
      val mn = col(s"__mn_$c")
      val w = (col(s"__mx_$c") - mn) / lit(nBuckets.toDouble)
      df.select(x.as("x"))
        .crossJoin(broadcast(mm.select(col(s"__mn_$c"), col(s"__mx_$c"))))
        .select(lit(c).as("col_name"),
          when(w === 0.0, lit(0L)).otherwise(
            least(floor((col("x") - mn) / w), lit((nBuckets - 1).toLong))
              .cast("long")).as("bucket"))
    }
    perCol.reduce(_ unionAll _)
      .groupBy("col_name", "bucket").agg(count(lit(1)).as("n"))
  }

  /** Per-key time-series anomaly flags: bucket rows into (key, period)
    * sums, then flag periods where |sum − mean_key| > z·σ_key. The
    * period sums are exact DECIMAL(18,2) (order-independent), the
    * per-key moments come from Σx and Σx² of those exact sums, and
    * only the final z-score runs in floating point — so the flags are
    * deterministic under any partitioning. Scale shape: two partial-agg
    * shuffles (periods, then per-key moments — the second input is
    * #periods-sized, not #events-sized) and one broadcast-sized join
    * back. */
  def periodAnomalies(df: DataFrame, keyCol: String, periodCol: Column,
                      valueCol: String, zThreshold: Double): DataFrame = {
    val daily = df
      .groupBy(col(keyCol).as("key"), periodCol.as("period"))
      // downcast the sum back to (18,2): keeps dsum·dsum inside
      // DECIMAL(37,4) so BOTH engines multiply exactly (38-wide
      // operands would overflow DuckDB's multiply and trigger Spark's
      // precision-loss rounding)
      .agg(sum(col(valueCol).cast("decimal(18,2)"))
        .cast("decimal(18,2)").as("dsum"))
      .select(col("key"), col("period"), col("dsum").cast("double").as("s"),
        col("dsum"))
    val stats = daily.groupBy("key").agg(
      count(lit(1)).as("n"),
      sum(col("dsum")).cast("double").as("sx"),
      sum(col("dsum") * col("dsum")).cast("double").as("sxx"))
    val sigma = sqrt(greatest(
      (col("sxx") - col("sx") * col("sx") / col("n")) / col("n"), lit(0.0)))
    daily.join(broadcast(stats), "key")
      .select(col("key"), col("period"), col("s"),
        // a flat series (σ = 0) has no anomalies by definition — and
        // ANSI mode would otherwise throw on the division
        when(sigma === 0.0, lit(0.0))
          .otherwise((col("s") - col("sx") / col("n")) / sigma).as("z"))
      .filter(abs(col("z")) > zThreshold)
  }

  /** Exact-quantile binning (histogram equalization / the
    * QuantileDiscretizer of feature engineering): cut a numeric
    * column into `nBins` equal-mass buckets at its own quantile
    * edges, then profile each bucket — the binning step behind
    * bucketed features, stratified length sampling, and the fit's
    * own maxBins gate, promoted to a user-facing operator.
    *
    * Edges are the `(1..nBins-1)/nBins` quantiles in ONE aggregation
    * (a single array-percentile agg, not nBins separate jobs); the
    * bucket id of a value is COUNT(edges < value) — ties land in the
    * LOWER bucket, both engines compare against identical edge
    * doubles (`percentile` ≡ DuckDB `quantile_cont`, the
    * q_quantiles-pinned pair), so assignment is deterministic and
    * engine-portable. Duplicate-heavy columns can yield duplicate
    * edges; the affected buckets are then empty and absent from the
    * output (count 0), never mis-assigned.
    *
    * `approx = false` (default, oracle path) is an exact percentile —
    * an ordered aggregation whose sort serializes on one task at
    * extreme n; `approx = true` swaps in `approx_percentile`
    * (mergeable sketch, partial-aggregating) — the corpus-scale path,
    * with sketch-dependent edges (the madOutliers trade, spec-pinned
    * on agreement away from edges). The collected edge array is
    * nBins-1 doubles — model-sized, not data-sized.
    *
    * Output: (bin, n, lo, hi) — per non-empty bucket, its row count
    * and observed [min, max] rounded to 6dp. */
  def quantileBin(df: DataFrame, valueCol: String, nBins: Int,
                  approx: Boolean = false): DataFrame = {
    require(nBins >= 2, "need at least 2 bins")
    val v = df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val probs = (1 until nBins).map(_.toDouble / nBins)
    val probsCol = typedLit(probs)
    val edgeAgg =
      if (approx) approx_percentile(col("v"), probsCol, lit(10000))
      else percentile(col("v"), probsCol)
    val edges: Seq[Double] =
      v.agg(edgeAgg.as("e")).head().getSeq[Double](0)
    v.withColumn("bin",
        size(filter(typedLit(edges), e => col("v") > e)).cast("long"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        round(min(col("v")), 6).as("lo"), round(max(col("v")), 6).as("hi"))
  }

  /** Robust per-group outlier screen on median/MAD instead of
    * mean/σ: a row is flagged when |value − median| > thr × MAD
    * (MAD = median absolute deviation). Mean/σ screens
    * ([[periodAnomalies]]) break down exactly when outliers are worst
    * — the outliers inflate σ and hide themselves; the median and MAD
    * have a 50% breakdown point, the standard robust alternative.
    * MAD = 0 (at least half the group sits exactly at the median)
    * degenerates the rule to "any deviation flags", the conventional
    * reading of an infinite robust z.
    *
    * With `approx = false` (the default, and the oracle path) both
    * statistics are EXACT percentiles, so the flagged set is
    * deterministic and engine-portable (`percentile` ≡ DuckDB
    * `quantile_cont`, the q_quantiles-pinned pair) — but each exact
    * percentile is an ORDERED aggregation per group, and at 100× a
    * hot key serializes its group's sort on one task. `approx = true`
    * swaps both medians for `approx_percentile` (KLL-style mergeable
    * sketch, partial-aggregating, no per-group sort): the scale path
    * for extreme group sizes, at the cost of sketch-dependent edges —
    * values within ±(sketch error) of the true median/MAD cutoff may
    * flag differently, which is why the oracle pins only the exact
    * path while ProfilingSpec pins exact/approx agreement on the
    * planted-spike fixture (outliers far from the cutoff flag
    * identically under either estimator). Scale shape otherwise
    * unchanged: two per-key aggregations with the #keys-sized stats
    * tables joined back (AQE broadcasts them). Output: flagged rows
    * only, (key, id, value, med, mad) with med/mad rounded to 6dp. */
  def madOutliers(df: DataFrame, keyCol: String, idCol: String,
                  valueCol: String, thr: Double = 6.0,
                  approx: Boolean = false): DataFrame = {
    require(thr > 0, "thr must be positive")
    def median(c: Column): Column =
      if (approx) approx_percentile(c, lit(0.5), lit(10000))
      else percentile(c, lit(0.5))
    val base = df.select(col(keyCol).as("key"), col(idCol).as("id"),
      col(valueCol).cast("double").as("v"))
    val med = base.groupBy("key")
      .agg(median(col("v")).as("__med"))
    val dev = base.join(med, "key")
      .withColumn("__dev", abs(col("v") - col("__med")))
    val mad = dev.groupBy("key")
      .agg(median(col("__dev")).as("__mad"))
    dev.join(mad, "key")
      .filter(col("__dev") > lit(thr) * col("__mad"))
      .select(col("key"), col("id"), col("v").as("value"),
        round(col("__med"), 6).as("med"), round(col("__mad"), 6).as("mad"))
  }

  /** Per-group winsorization profile: the [pLow, pHigh] percentile
    * clipping bounds, how many values each side clips, and the exact
    * micros mean BEFORE and AFTER clipping — the standard
    * heavy-tail-taming step of feature cleaning (a handful of price
    * outliers can own a mean; winsorizing caps their leverage
    * without dropping rows), reported as a bounded per-group summary
    * so the curator sees exactly what the clip would do before
    * applying it.
    *
    * Exact path (default, the oracle path): `percentile` per group —
    * the q_quantiles-pinned `percentile` ≡ `quantile_cont` pair —
    * which is an ORDERED aggregation per group; at extreme group
    * sizes a hot key serializes its sort on one task, so
    * `approx = true` swaps in mergeable `approx_percentile` (the
    * [[madOutliers]] escape, same trade documented there). Means are
    * exact: values floor to micros longs BEFORE summing, one BIGINT
    * division each — partition-order independent in both engines.
    *
    * Output: (key, n, lo, hi, n_clip_low, n_clip_high,
    * mean_raw_micros, mean_wins_micros); lo/hi rounded to 6dp. */
  def winsorizeProfile(df: DataFrame, keyCol: String, valueCol: String,
                       pLow: Double, pHigh: Double,
                       approx: Boolean = false): DataFrame = {
    require(0.0 < pLow && pLow < pHigh && pHigh < 1.0,
      s"need 0 < pLow < pHigh < 1, got ($pLow, $pHigh)")
    val v = df.select(col(keyCol).as("key"), col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    def pct(p: Double): Column =
      if (approx) approx_percentile(col("v"), lit(p), lit(10000))
      else percentile(col("v"), lit(p))
    val pc = v.groupBy("key").agg(pct(pLow).as("lo"), pct(pHigh).as("hi"))
    val w = least(greatest(col("v"), col("lo")), col("hi"))
    v.join(pc, "key")
      .select(col("key"), col("v"), col("lo"), col("hi"), w.as("w"))
      .groupBy("key", "lo", "hi")
      .agg(count(lit(1)).as("n"),
        sum(when(col("v") < col("lo"), 1L).otherwise(0L)).as("n_clip_low"),
        sum(when(col("v") > col("hi"), 1L).otherwise(0L)).as("n_clip_high"),
        sum(floor(col("v") * lit(1e6) + lit(0.5)).cast("long")).as("sr"),
        sum(floor(col("w") * lit(1e6) + lit(0.5)).cast("long")).as("sw"))
      .select(col("key"), col("n"), round(col("lo"), 6).as("lo"),
        round(col("hi"), 6).as("hi"), col("n_clip_low"), col("n_clip_high"),
        expr("sr div n").as("mean_raw_micros"),
        expr("sw div n").as("mean_wins_micros"))
  }
}
