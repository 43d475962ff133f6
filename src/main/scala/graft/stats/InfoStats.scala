package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entropy / split-information / gain-ratio statistics as declarative
  * DataFrame aggregations — the Spark-native re-formulation of the
  * reference reducer's in-heap contingency math
  * (/root/reference/src/program/MyReducer.java:243-298, SURVEY.md A1-A7).
  *
  * All entropies use the factored one-aggregation form
  *   H = log2(N) − (Σ_k c_k·log2(c_k)) / N
  * which needs only `sum` + `log2` (whole-stage-codegen'd built-ins, no
  * UDF) and shuffles pre-aggregated counts, not raw rows — the partial
  * aggregation the reference lacks entirely (no combiner,
  * Main.java:188-196; SURVEY.md §4).
  */
object InfoStats {

  /** Gain ratio when split-info is 0 but the node is impure: the
    * reference emits this epsilon so the attribute stays selectable but
    * loses to any positive-gain attribute (MyReducer.java:295). */
  val Epsilon = 0.00001

  /** Minimum fraction of group rows each side of a numeric split must
    * hold for the boundary to be a candidate (MyReducer.java:34,188-190). */
  val DefaultMinDataRatio = 0.1

  /** x·log2(x) with the 0·log2(0) = 0 convention. */
  def plogp(c: Column): Column =
    when(c > 0, c * log2(c)).otherwise(lit(0.0))

  // Driver-side mirrors of the Column formulas, for math over bounded
  // collected histograms (C45.fit's per-level cells are O(model)).
  // Same identities, same special cases — summation order is the
  // CALLER's responsibility (sort keys first for determinism).

  /** Driver-side log2 (same ln-ratio form Spark's `log2` evaluates). */
  def log2D(x: Double): Double = math.log(x) / math.log(2.0)

  /** Driver-side [[plogp]]. */
  def plogpD(x: Double): Double = if (x > 0) x * log2D(x) else 0.0

  /** Driver-side gain ratio with the reference's splitInfo==0 special
    * cases (MyReducer.java:282-298), mirroring [[withGainRatio]]:
    * |splitInfo| < 1e-12 ⇒ 0 when the node is pure, else ε. */
  def gainRatioD(info: Double, splitInfo: Double, condE: Double): Double = {
    val tol = 1e-12
    if (math.abs(splitInfo) < tol) {
      if (math.abs(info) < tol) 0.0 else Epsilon
    } else (info - condE) / splitInfo
  }

  /** Per-key counts of `cls` within each gid group: the A2/A3 contingency
    * builder. Input: raw rows; output: gid ++ (keyCols, cnt). */
  def counts(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("cnt"))

  /** Shannon entropy of the `cntCol` distribution within each gid group:
    * groupBy(gid) → (n, entropy). Input must already be a counts table. */
  def entropyOfCounts(cnts: DataFrame, gidCols: Seq[String],
                      cntCol: String = "cnt"): DataFrame = {
    val g = if (gidCols.isEmpty) cnts.groupBy() else cnts.groupBy(gidCols.map(col): _*)
    g.agg(sum(col(cntCol)).as("n"), sum(plogp(col(cntCol))).as("s"))
      .select((gidCols.map(col) :+ col("n") :+
        (log2(col("n")) - col("s") / col("n")).as("entropy")): _*)
  }

  /** Full categorical split statistics from a contingency-cell table.
    *
    * Input `cells`: one row per (gid..., attr-value, class) with its
    * count — columns `gidCols ++ (valCol, clsCol, cntCol)`. gid usually
    * includes the candidate-attribute id so ALL attributes of a level are
    * scored in one shuffled aggregation (the reference runs one reduce
    * call per (rule,attr) over raw pairs instead, MyReducer.java:36-206).
    *
    * Output: one row per gid with `n, info, split_info, cond_entropy,
    * gain, gain_ratio` using identities (SURVEY.md A4-A7):
    *   info      = log2 N − S_cls/N     (S_cls = Σ_c m_c·log2 m_c)
    *   splitInfo = log2 N − S_val/N     (S_val = Σ_v n_v·log2 n_v)
    *   condE     = (S_val − S_cell)/N   (S_cell = Σ_{v,c} c_vc·log2 c_vc)
    * and the reference's special cases: splitInfo==0 ∧ pure ⇒ 0,
    * splitInfo==0 ∧ impure ⇒ ε=1e-5 (MyReducer.java:282-298).
    */
  def categoricalSplitStats(cells: DataFrame, gidCols: Seq[String],
                            valCol: String = "val", clsCol: String = "cls",
                            cntCol: String = "cnt"): DataFrame = {
    val gid = gidCols.map(col)
    val perVal = cells.groupBy((gidCols :+ valCol).map(col): _*)
      .agg(sum(col(cntCol)).as("nv"), sum(plogp(col(cntCol))).as("s_cell_v"))
    val perCls = cells.groupBy((gidCols :+ clsCol).map(col): _*)
      .agg(sum(col(cntCol)).as("mc"))
    val valAgg = perVal.groupBy(gid: _*).agg(
      sum(col("nv")).as("n"),
      sum(plogp(col("nv"))).as("s_val"),
      sum(col("s_cell_v")).as("s_cell"))
    val clsAgg = perCls.groupBy(gid: _*).agg(sum(plogp(col("mc"))).as("s_cls"))
    val joined =
      if (gidCols.isEmpty) valAgg.crossJoin(clsAgg)
      else valAgg.join(clsAgg, gidCols)
    withGainRatio(joined
      .withColumn("info", log2(col("n")) - col("s_cls") / col("n"))
      .withColumn("split_info", log2(col("n")) - col("s_val") / col("n"))
      .withColumn("cond_entropy", (col("s_val") - col("s_cell")) / col("n")))
      .select((gid ++ Seq(col("n"), col("info"), col("split_info"),
        col("cond_entropy"), col("gain"), col("gain_ratio"))): _*)
  }

  /** Attach gain + gain_ratio columns given info/split_info/cond_entropy,
    * with the reference's splitInfo==0 special cases. A float-noise
    * tolerance treats |x| < 1e-12 as zero. */
  private def withGainRatio(df: DataFrame): DataFrame = {
    val tol = 1e-12
    df.withColumn("gain", col("info") - col("cond_entropy"))
      .withColumn("gain_ratio",
        when(abs(col("split_info")) < tol,
          when(abs(col("info")) < tol, lit(0.0)).otherwise(lit(Epsilon)))
          .otherwise(col("gain") / col("split_info")))
  }

  /** One-pass numeric best-split search (SURVEY.md O2) — the O(n log n)
    * window re-formulation of the reference's O(n·distinct) in-heap
    * boundary rescan (MyReducer.java:112-205,300-322).
    *
    * Input `df`: raw rows with `gidCols ++ (valCol numeric, clsCol)`.
    * Pipeline: groupBy(gid, val, cls).count — a partial-aggregated
    * shuffle that collapses the data to distinct values — then pivot the
    * (small, closed) class-label set to columns and run cumulative sums
    * over a `Window.partitionBy(gid).orderBy(val)`: at each candidate
    * boundary B (= a distinct value; the maximum is skipped per
    * MyReducer.java:140-141) the running counts ARE the left-partition
    * contingency row, so left/right entropies fall out of the same
    * log-sum identity with no second pass.
    *
    * Returns the per-boundary scan table: gid ++ (boundary, left_n,
    * right_n, n, info, split_info, cond_entropy, gain, gain_ratio),
    * already filtered to candidates where both sides hold ≥ minDataRatio
    * of the group (MyReducer.java:188-190). Use [[bestSplits]] for the
    * per-gid argmin.
    */
  def boundaryScan(df: DataFrame, gidCols: Seq[String], classLabels: Seq[String],
                   valCol: String = "val", clsCol: String = "cls",
                   minDataRatio: Double = DefaultMinDataRatio): DataFrame = {
    require(classLabels.nonEmpty, "classLabels must be the closed label set")
    val gid = gidCols.map(col)
    val cc = (i: Int) => s"c$i"
    // distinct-value × class contingency (partial agg under the shuffle)
    val cells = df.groupBy((gidCols ++ Seq(valCol, clsCol)).map(col): _*)
      .agg(count(lit(1)).as("cnt"))
    // pivot classes to columns: one row per (gid, value)
    val pivoted = cells.groupBy((gidCols :+ valCol).map(col): _*)
      .pivot(clsCol, classLabels)
      .sum("cnt").na.fill(0)
      .select((gid :+ col(valCol)) ++ classLabels.indices.map(i =>
        col(classLabels(i)).as(cc(i))): _*)
    // a gid-less (or constant-gid) call is a GLOBAL scan: the window
    // DELIBERATELY holds the whole table in ONE ordered partition —
    // and that is bounded by construction, because the input was
    // already collapsed to distinct values by the groupBy above and
    // the caller's contract pre-bins continuous attributes to
    // ≤ maxBins values (C45.fit / rootRank's quantile snap). Spark 4's
    // EliminateWindowPartitions folds any constant key back to an
    // unpartitioned window, so WindowExec's "No Partition Defined"
    // warning is EXPECTED here and owned: it flags a single-partition
    // sort that we have sized to at most maxBins rows per attribute.
    val partKeys: Seq[Column] = if (gid.isEmpty) Seq(lit(0)) else gid
    val wOrd = Window.partitionBy(partKeys: _*).orderBy(col(valCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(partKeys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val idx = classLabels.indices
    val withCums = pivoted.select(
      (gid :+ col(valCol).cast("double").as("boundary")) ++
        idx.map(i => sum(col(cc(i))).over(wOrd).as(s"l$i")) ++
        idx.map(i => sum(col(cc(i))).over(wAll).as(s"t$i")): _*)
    val leftN = idx.map(i => col(s"l$i")).reduce(_ + _)
    val totN = idx.map(i => col(s"t$i")).reduce(_ + _)
    val sLeft = idx.map(i => plogp(col(s"l$i"))).reduce(_ + _)
    val sRight = idx.map(i => plogp(col(s"t$i") - col(s"l$i"))).reduce(_ + _)
    val sTot = idx.map(i => plogp(col(s"t$i"))).reduce(_ + _)
    val scan = withCums
      .withColumn("left_n", leftN)
      .withColumn("n", totN)
      .withColumn("right_n", col("n") - col("left_n"))
      // skip the max value (no right side) and the min-ratio guard
      .filter(col("right_n") > 0 &&
        col("left_n") >= col("n") * minDataRatio &&
        col("right_n") >= col("n") * minDataRatio)
      .withColumn("info", log2(col("n")) - sTot / col("n"))
      .withColumn("cond_entropy",
        ((col("left_n") * log2(col("left_n")) - sLeft) +
          (col("right_n") * log2(col("right_n")) - sRight)) / col("n"))
      .withColumn("split_info",
        log2(col("n")) -
          (plogp(col("left_n")) + plogp(col("right_n"))) / col("n"))
    withGainRatio(scan).select(
      (gid ++ Seq(col("boundary"), col("left_n"), col("right_n"), col("n"),
        col("info"), col("split_info"), col("cond_entropy"), col("gain"),
        col("gain_ratio"))): _*)
  }

  /** Per-gid argmin of conditional entropy over [[boundaryScan]] output
    * (SURVEY.md O3 shape): deterministic top-1 via row_number ordered by
    * (cond_entropy asc, boundary asc) — ties go to the smallest
    * boundary, matching the reference's first-wins ascending scan
    * (MyReducer.java:193-198 uses strict `<`). */
  def bestSplits(scan: DataFrame, gidCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(gidCols.map(col): _*)
      .orderBy(col("cond_entropy").asc, col("boundary").asc)
    scan.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }
}
