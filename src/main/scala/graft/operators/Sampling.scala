package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and cardinality sketching for training-data
  * curation. Everything derives from the portable salted-md5 hash
  * (graft.functions.Hashing), so a sample is (a) reproducible across
  * runs and engines, (b) stable under repartitioning — unlike
  * `df.sample`, whose output depends on partition layout — and (c) a
  * pure pushdown-friendly filter (no shuffle at all for Bernoulli
  * sampling; one window shuffle for fixed-size).
  */
object Sampling {

  /** Null-safe id hash: a null id hashes as the empty string. Without
    * the coalesce, Spark's `concat('0|', NULL)` is NULL → the keep
    * filter is NULL → the row is silently DROPPED, while DuckDB's
    * concat skips NULLs and keeps deciding — a latent cross-engine
    * divergence on null ids. With it, both engines hash '0|'. */
  private def idHash(idCol: Column): Column =
    Hashing.hash60(coalesce(idCol.cast("string"), lit("")))

  /** Per-row keep decision: hash of the id lands in [0, permille) of
    * the per-mille scale. */
  private def keep(idCol: Column, permille: Column): Column =
    idHash(idCol) % 1000 < permille

  /** Deterministic Bernoulli sample: keep ~permille/1000 of rows,
    * chosen by id hash (reproducible, partition-independent). */
  def bernoulli(df: DataFrame, idCol: String, permille: Int): DataFrame =
    df.filter(keep(col(idCol), lit(permille)))

  /** Deterministic stratified sample: a per-stratum sampling rate (in
    * per-mille), defaulting to `defaultPermille` for unlisted strata.
    * Pure filter — no shuffle, scans once, pushdown-safe. */
  def stratified(df: DataFrame, strataCol: String, idCol: String,
                 permilleByStratum: Map[String, Int],
                 defaultPermille: Int): DataFrame = {
    val rate = permilleByStratum.foldLeft(lit(defaultPermille)) {
      case (acc, (k, v)) => when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(keep(col(idCol), rate))
  }

  /** Deterministic fixed-size sample per stratum: the n rows with the
    * smallest id hashes in each stratum (a rank-based reservoir — same
    * result regardless of data order or partitioning).
    *
    * Two-phase top-n: a single window partitioned by stratum would
    * funnel the WHOLE table into #strata serial sort partitions —
    * parallelism collapses to the stratum count (events has 4) and the
    * query goes superlinear at scale. Phase 1 windows over (stratum,
    * salt) — #strata × nSalts parallel partitions — keeping each salt
    * bucket's n smallest; the global n smallest per stratum are
    * necessarily among their bucket's n smallest, so phase 2 ranks
    * only the surviving nSalts × n rows per stratum. Salt derives from
    * the id hash, so the result is still partition-independent. */
  def fixedPerStratum(df: DataFrame, strataCol: String, idCol: String,
                      n: Int, nSalts: Int = 32): DataFrame = {
    require(nSalts >= 1, "nSalts must be positive")
    // materialize the hash once: window sort keys and the salt would
    // otherwise each re-evaluate the md5 per row per reference
    val w1 = Window.partitionBy(col(strataCol), col("__salt"))
      .orderBy(col("__h"), col(idCol))
    val w2 = Window.partitionBy(strataCol)
      .orderBy(col("__h"), col(idCol))
    df.withColumn("__h", idHash(col(idCol)))
      .withColumn("__salt", pmod(col("__h"), lit(nSalts.toLong)))
      .withColumn("__rn", row_number().over(w1))
      .filter(col("__rn") <= n)
      .withColumn("__rn2", row_number().over(w2))
      .filter(col("__rn2") <= n)
      .drop("__h", "__salt", "__rn", "__rn2")
  }

  /** Data-mixture rebalancing: sample each stratum at the rate that
    * hits a TARGET mixture by weight (the "30% web / 30% code / 40%
    * books" step of training-corpus construction). Each listed stratum
    * s with target share `share_pm(s)` per-mille of `budget` total
    * weight keeps rows at rate
    *   ppm(s) = min(10^6, (budget·share_pm(s) div 1000)·10^6 div W_s)
    * parts-per-million, where W_s is the stratum's OBSERVED total
    * weight — so the expected sampled weight per stratum is its
    * mixture target (capped at keep-everything when the corpus has
    * less of s than the mixture wants). Unlisted strata are excluded:
    * a mixture is a whitelist.
    *
    * Everything stays in the plan: the per-stratum weights are a
    * partial-aggregated groupBy (#strata rows), the derived rates ride
    * a broadcast join back onto the corpus, and the keep decision is
    * the usual portable id-hash Bernoulli — no driver collect, any
    * number of strata. Integer-only rate arithmetic (floor divisions)
    * keeps the decision bit-identical across engines. */
  def mixtureSample(df: DataFrame, strataCol: String, idCol: String,
                    weightCol: String, sharePermille: Map[String, Int],
                    budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(sharePermille.values.forall(v => v >= 0 && v <= 1000),
      "shares are per-mille in [0, 1000]")
    // an oversubscribed mixture (> 1000‰ total) would silently target
    // more than `budget` total weight — reject it loudly
    require(sharePermille.values.sum <= 1000,
      s"mixture shares sum to ${sharePermille.values.sum}‰ > 1000‰ of budget")
    val spark = df.sparkSession
    import spark.implicits._
    val targets = sharePermille.toSeq.sortBy(_._1)
      .toDF(strataCol, "__share_pm")
    // DECIMAL(38,0) intermediates: the target-weight × 10^6 product
    // wraps int64 (silently, under non-ANSI Spark) once a stratum's
    // target weight passes ~9.2e12 — realistic for multi-trillion-token
    // mixtures — while DuckDB errors or promotes; decimal keeps the
    // rate bit-identical across engines to 38 digits (the oracle
    // mirrors with HUGEINT). Operation order matters: the div-1000
    // truncation happens BEFORE the ppm scaling, per the doc formula.
    val rates = df.groupBy(strataCol)
      .agg(sum(col(weightCol)).as("__w"))
      .join(broadcast(targets), strataCol)
      .withColumn("__ppm", least(lit(1000000L),
        expr(s"CAST((CAST($budget AS DECIMAL(38,0)) * __share_pm) div 1000" +
          " AS DECIMAL(38,0)) * 1000000 div __w")))
      .select(col(strataCol), col("__ppm"))
    df.join(broadcast(rates), strataCol)
      .filter(idHash(col(idCol)) % 1000000 < col("__ppm"))
      .drop("__ppm")
  }

  /** Weighted sampling WITHOUT replacement, k per stratum — the
    * Efraimidis–Vitter reservoir (Efraimidis & Spirakis, IPL 2006)
    * made deterministic and distributed: each row draws
    * u = (hash60(id)+0.5)/2^60 from the portable hash and keeps key
    * score = ln(u)/w (monotone with the paper's u^(1/w)); the k
    * LARGEST scores per stratum are exactly a weight-proportional
    * sample without replacement. Scores round half-up at 9dp so the
    * selection is engine-exact; ties break toward the smaller id.
    *
    * Scale shape: a pure-Column score (no shuffle) feeding
    * [[GroupTopK.topKByKey]]'s k-bounded partial-combining aggregate
    * — map-side trims every partition to ≤ k rows per stratum, so a
    * giant stratum never serializes into one task (the row_number
    * window would). Rows with non-positive weight are excluded (zero
    * weight ⇒ never sampled, the paper's convention).
    *
    * Output: (stratum, rank 1..k, id, score). */
  def weightedSample(df: DataFrame, strataCol: String, idCol: String,
                     weightCol: String, k: Int, salt: Int = 13): DataFrame = {
    require(k >= 1, "k must be positive")
    val u = (Hashing.hash60(col(idCol).cast("string"), salt) + lit(0.5)) /
      lit(1152921504606846976.0) // 2^60
    val score = floor(log(u) / col(weightCol) * lit(1e9) + lit(0.5)) / lit(1e9)
    GroupTopK.topKByKey(df.filter(col(weightCol) > 0),
        col(strataCol), col(idCol), score, k)
      .withColumnRenamed("key", "stratum")
  }

  /** DSIR-style importance resampling (Xie et al. 2023,
    * arXiv:2302.03169): select raw-corpus documents whose hashed
    * n-gram distribution looks like a TARGET corpus. Per document,
    *
    *   log w(d) = Σ_b c_db · [ ln((c_tb+1)/(C_t+B)) − ln((c_rb+1)/(C_r+B)) ]
    *
    * — the Laplace-smoothed log-likelihood ratio of the doc's hashed
    * token buckets under the target vs the raw unigram model (B =
    * `nBuckets` hash buckets; hashed features are what make the model
    * table bounded at ANY vocabulary, the paper's trick). Selection is
    * Gumbel top-k: score = log w + Gumbel noise, keep the `nKeep`
    * best — equivalent to sampling without replacement proportionally
    * to w, and fully deterministic here because the noise derives
    * from the portable id hash (u = (hash60(id)+0.5)/2^60 ∈ (0,1),
    * g = −ln(−ln u)).
    *
    * Scale shape: two partial-agg token→bucket count rollups (target
    * and raw models — each ≤ B rows), a broadcast of the ≤ B-row
    * model delta table onto the per-(doc, bucket) counts, one
    * partial-agg per-doc sum, and a TakeOrdered global top-nKeep
    * (per-partition heaps — no global sort; for a keep set too large
    * to TakeOrdered, threshold on a score quantile instead). All
    * per-pair contributions and the noise round to integer MICROS
    * before summation/comparison, so the kept set is bit-stable under
    * any partitioning and engine-portable.
    *
    * Output: every raw doc as (id, logw_micros, score_micros, keep).
    * Ties at the boundary break toward the smaller id. */
  def dsirResample(raw: DataFrame, target: DataFrame, idCol: String,
                   textCol: String, nBuckets: Int, nKeep: Int,
                   salt: Int = 11): DataFrame = {
    require(nBuckets >= 2, "need at least 2 hash buckets")
    require(nKeep >= 1, "nKeep must be positive")
    def bucketed(df: DataFrame): DataFrame = df
      .select(col(idCol).as("id"),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("tok"))
      .select(col("id"), pmod(Hashing.hash60(col("tok")), lit(nBuckets)).as("b"))
    val tgtCnt = bucketed(target).groupBy("b").agg(count(lit(1)).as("c_t"))
    val rawTok = bucketed(raw)
    val rawCnt = rawTok.groupBy("b").agg(count(lit(1)).as("c_r"))
    val totals = tgtCnt.agg(sum(col("c_t")).as("tot_t"))
      .crossJoin(rawCnt.agg(sum(col("c_r")).as("tot_r")))
    // ≤ B rows: per-bucket log-likelihood-ratio delta, broadcast back
    val model = rawCnt.join(tgtCnt, Seq("b"), "full_outer")
      .crossJoin(totals)
      .select(col("b"),
        (log((coalesce(col("c_t"), lit(0L)) + lit(1.0)) /
          (col("tot_t") + lit(nBuckets))) -
          log((coalesce(col("c_r"), lit(0L)) + lit(1.0)) /
            (col("tot_r") + lit(nBuckets)))).as("delta_ln"))
    val logw = rawTok.groupBy("id", "b").agg(count(lit(1)).as("c"))
      .join(broadcast(model), "b")
      .groupBy("id")
      .agg(sum(floor(col("c") * col("delta_ln") * lit(1e6) + lit(0.5))
        .cast("long")).as("logw_micros"))
    val u = (Hashing.hash60(col("id").cast("string"), salt) + lit(0.5)) /
      lit(1152921504606846976.0) // 2^60
    val scored = logw.withColumn("score_micros",
      col("logw_micros") +
        floor(-log(-log(u)) * lit(1e6) + lit(0.5)).cast("long"))
    val kept = scored.orderBy(col("score_micros").desc, col("id"))
      .limit(nKeep).select(col("id"), lit(true).as("__keep"))
    scored.join(broadcast(kept), Seq("id"), "left")
      .select(col("id"), col("logw_micros"), col("score_micros"),
        coalesce(col("__keep"), lit(false)).as("keep"))
  }

  /** Greedy per-stratum token-budget cap (data-mixture construction:
    * "at most `budget` tokens per source"): within each stratum, rows
    * are taken in id order until the budget is exhausted — the kept
    * set is the maximal prefix whose weight sum fits. One windowed
    * cumulative sum per stratum (a single hash shuffle on the stratum
    * key); deterministic and partition-independent because the order
    * is the id, not arrival. At corpus scale the window sort is
    * per-stratum — if one domain dominates the corpus, pre-filter it
    * with [[bernoulli]] to a few × budget first so the sort input
    * stays bounded. */
  def tokenCapPerStratum(df: DataFrame, strataCol: String, idCol: String,
                         weightCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(!df.columns.contains("__cum"), "__cum is reserved")
    val before = Window.partitionBy(col(strataCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__cum",
        coalesce(sum(col(weightCol)).over(before), lit(0L)))
      .filter(col("__cum") + col(weightCol) <= budget)
      .drop("__cum")
  }

  /** Leakage-safe train/val/test assignment: the split is decided by
    * the hash of a CLUSTER key (a near-duplicate cluster label, a
    * canonical fingerprint, a URL host…), so every member of a cluster
    * lands in the same split and near-duplicates can never straddle
    * train and test. Pure Column — no shuffle, pushdown-safe, and
    * reproducible across runs and engines (portable md5 family).
    * Fractions are per-mille: test gets [0, testPermille), val the
    * next valPermille, train the rest. */
  def splitAssign(df: DataFrame, clusterCol: String, testPermille: Int,
                  valPermille: Int, salt: Int = 7): DataFrame = {
    require(testPermille >= 0 && valPermille >= 0 &&
      testPermille + valPermille <= 1000, "permilles must fit in [0,1000]")
    val h = Hashing.hash60(
      coalesce(col(clusterCol).cast("string"), lit("")), salt) % 1000
    df.withColumn("split",
      when(h < testPermille, "test")
        .when(h < testPermille + valPermille, "val")
        .otherwise("train"))
  }

  /** KMV (k-minimum-values) distinct-count sketch: keep the k smallest
    * 60-bit hashes of the column's distinct values; the estimator is
    * `(k-1) · 2^60 / h_(k)` (Bar-Yossef et al., RANDOM 2002). When
    * fewer than k distinct values exist the sketch IS the exact count.
    *
    * Unlike HLL this sketch is exactly deterministic and
    * engine-portable (same md5 family both sides), so it hash-matches
    * a SQL oracle. Scale shape: distinct (partial-aggregated shuffle)
    * → global top-k via orderBy+limit (TakeOrdered — per-partition
    * heaps, no full sort).
    *
    * Output: one row (k_actual, kth_hash, est_distinct). */
  def kmvDistinct(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    val twoPow60 = 1152921504606846976.0 // 2^60, exact in double
    df.select(Hashing.hash60(col(valueCol).cast("string")).as("h"))
      .distinct()
      .orderBy("h").limit(k)
      .agg(count(lit(1)).as("k_actual"), max(col("h")).as("kth_hash"))
      .select(col("k_actual"), col("kth_hash"),
        (floor(when(col("k_actual") < k, col("k_actual").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(twoPow60) /
            col("kth_hash").cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("est_distinct"))
  }
}
