package graft.fit

import graft.meta.C45Schema
import graft.model.Rule
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Tuning knobs for [[C45Forest.fit]] — bagged C4.5 (Breiman 1996,
  * "Bagging Predictors") with an optional random-subspace restriction
  * per tree (Ho 1998). `nTrees` bootstrap replicates; `attrsPerTree`
  * (0 = all) restricts each tree to a deterministic rotating subset of
  * the schema's attributes — tree t sees attr index i iff
  * `(i + t) % d < attrsPerTree`, so every attribute appears in exactly
  * `attrsPerTree` of any `d` consecutive trees; `seed` salts the
  * bootstrap hash. `base.missingMode` picks the null-value semantics:
  * "drop" (a null attribute value leaves each histogram slice and
  * routes to no leaf, the single-tree drop mode per replicate) or
  * "fractional" (canonical C4.5 unknown-value distribution — a
  * null-valued row descends EVERY child of its rule's split with
  * weight bootstrap-multiplicity × known-mass share, exact micros; see
  * the [[C45Forest.fit]] scaladoc for the fused clean/dirty plan).
  * `mtry` (0 = off) is Breiman-2001 per-NODE random feature sampling:
  * each open node considers only a deterministic md5-ranked sample of
  * `mtry` of its live attributes ([[C45Forest.mtrySample]]) — sampling
  * per split decorrelates trees better than the per-tree subspace
  * alone when attributes are few; the two restrictions compose (the
  * sample draws from the subspace minus the path's used attrs). */
case class C45ForestParams(nTrees: Int = 10,
                           attrsPerTree: Int = 0,
                           seed: Int = 42,
                           mtry: Int = 0,
                           base: C45Params = C45Params(missingMode = "drop")) {
  require(nTrees >= 1, s"nTrees must be >= 1: $nTrees")
  require(attrsPerTree >= 0, s"attrsPerTree must be >= 0: $attrsPerTree")
  require(mtry >= 0, s"mtry must be >= 0: $mtry")
}

/** A fitted bagged-C4.5 ensemble: `trees(t)` is the C4.5 model of the
  * t-th bootstrap replicate. Serving is majority vote across trees
  * (ties break toward the lexicographically smallest label); each
  * member model serves through its own [[C45Model.transform]] plan, so
  * the vote is T flat CASE WHEN columns + one pure-Column argmax —
  * zero joins, zero shuffles, fully codegen'd. */
case class C45Forest(trees: Vector[C45Model], seed: Int) {

  /** Sorted union of the member trees' class labels. */
  def labels: Seq[String] =
    trees.flatMap(_.schema.classLabels).distinct.sorted

  /** Per-label vote argmax over prediction columns `predCols`, ties to
    * the smallest label: greatest((count, rank, label)) where rank
    * DEscends with the label sort order, so an equal count prefers the
    * earlier label. `gate(t)` optionally masks tree t's vote (the OOB
    * path votes only out-of-bag trees). */
  private def voteColumn(predCols: Seq[Column],
                         gate: Int => Column = _ => lit(true)): Column = {
    val ls = labels
    if (ls.size == 1) return lit(ls.head)
    val structs = ls.zipWithIndex.map { case (l, i) =>
      val cnt = predCols.zipWithIndex.map { case (p, t) =>
        when(gate(t) && p === lit(l), 1).otherwise(0)
      }.reduce(_ + _)
      struct(cnt.as("c"), lit(ls.size - i).as("r"), lit(l).as("l"))
    }
    greatest(structs: _*).getField("l")
  }

  /** Score `df`: adds `outputCol` with the majority-vote label. */
  def transform(df: DataFrame, outputCol: String = "prediction"): DataFrame = {
    val preds = trees.indices.map(t => s"__c45f_p$t")
    val scored = trees.indices.foldLeft(df)((d, t) =>
      trees(t).transform(d, preds(t)))
    scored.withColumn(outputCol, voteColumn(preds.map(col)))
      .drop(preds: _*)
  }

  /** Score `df` with class-membership probabilities: `outputCol` is the
    * majority-vote label (same estimator as [[transform]] — hard
    * voting), and each `probPrefix<class>` column is the ensemble
    * AVERAGE of the member trees' leaf-distribution micros —
    * floorDiv(Σ_t p_t + T/2, T), exact integer arithmetic (each tree's
    * micros ≤ 10⁶ and T is model-sized, so the double-backed floor is
    * exact far below 2⁵³). Every member tree carries recorded
    * distributions by construction of [[C45Forest.fit]].
    *
    * A member tree only emits micros columns for its OWN
    * [[C45Model.probaClasses]] — a bootstrap bag can miss a rare class
    * entirely (or see it only in zero-mass depth-exhausted leaves), in
    * which case that tree assigns the class zero mass everywhere, so
    * the ensemble average reads `0L` for it instead of referencing a
    * column the tree never produced. */
  def transformProba(df: DataFrame, outputCol: String = "prediction",
                     probPrefix: String = "p_"): DataFrame = {
    val T = trees.size
    val preds = trees.indices.map(t => s"__c45f_p$t")
    val scored = trees.indices.foldLeft(df)((d, t) =>
      trees(t).transformProba(d, preds(t), probPrefix = s"__c45f_tp${t}_"))
    val withVote = scored.withColumn(outputCol, voteColumn(preds.map(col)))
    val emitted: Vector[Set[String]] = trees.map(_.probaClasses.toSet)
    val out = labels.foldLeft(withVote) { (d, c) =>
      val sum = trees.indices.map(t =>
        if (emitted(t)(c)) col(s"__c45f_tp${t}_$c") else lit(0L)).reduce(_ + _)
      d.withColumn(s"$probPrefix$c",
        floor((sum + lit(T / 2)) / lit(T)).cast("long"))
    }
    out.drop(preds: _*)
      .drop(trees.indices.flatMap(t =>
        emitted(t).toSeq.map(c => s"__c45f_tp${t}_$c")): _*)
  }

  /** Missing-value serving — the ensemble counterpart of
    * [[C45Model.transformFractional]]: each member scores through its
    * OWN fractional-weight vote (a null split value descends every
    * child weighted by the fit-recorded leaf masses), then the
    * ensemble majority-votes those per-tree predictions exactly as
    * [[transform]] does. Null-free rows get [[transform]]'s answer
    * bit-for-bit (every member factor is 0 or 1). Needs fit-produced
    * or sidecar-loaded members (rule-text-only trees carry no masses
    * and must serve through [[transform]]). Flat map-only per member
    * while models are narrow — zero joins, zero shuffles. */
  def transformFractional(df: DataFrame,
                          outputCol: String = "prediction"): DataFrame = {
    val preds = trees.indices.map(t => s"__c45f_p$t")
    val scored = trees.indices.foldLeft(df)((d, t) =>
      trees(t).transformFractional(d, preds(t)))
    scored.withColumn(outputCol, voteColumn(preds.map(col)))
      .drop(preds: _*)
  }

  /** FULL ensemble persistence: one [[C45Model.save]] directory per
    * tree (`dir/t<i>/` — reference text codec + parquet distribution
    * sidecar) plus a one-line `forest.txt` (`nTrees,seed`), all through
    * the Hadoop FileSystem API so any save-visible path (local, HDFS,
    * s3a) works. [[C45Forest.load]] restores a forest whose vote,
    * probabilities, and OOB masks are bit-identical to the live fit's
    * (q_forest_roundtrip gates this). */
  def save(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dirPath)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(dirPath, "forest.txt"), true)
    try out.write(s"${trees.size},$seed".getBytes("UTF-8"))
    finally out.close()
    trees.zipWithIndex.foreach { case (m, t) =>
      m.save(spark, new org.apache.hadoop.fs.Path(dirPath, s"t$t").toString)
    }
  }

  /** Out-of-bag evaluation (Breiman's "out-of-bag estimates"): each row
    * is scored ONLY by the trees whose bootstrap replicate excluded it
    * (bootstrap weight 0, recomputed from `key` — the same hash the fit
    * used, so the masks are exact). Rows in every tree's bag (prob
    * ≈ 0.632^T) carry no out-of-bag vote and are excluded. Returns the
    * confusion counts `(actual, oob_prediction, n)` — an unbiased
    * held-out error estimate with ZERO extra fits and one tiny
    * aggregation job. Scoring uses [[transform]]'s deterministic hard
    * routing (a null on a path falls to that tree's majority),
    * regardless of the fit's missing mode. */
  def oobEval(df: DataFrame, key: Column, actualCol: String): DataFrame = {
    val preds = trees.indices.map(t => s"__c45f_p$t")
    val scored = trees.indices.foldLeft(df)((d, t) =>
      trees(t).transform(d, preds(t)))
    val oob = trees.indices.map(t =>
      C45Forest.bootstrapU(key, lit(t), seed) < C45Forest.PoissonCum(0))
    val nOob = oob.map(o => when(o, 1).otherwise(0)).reduce(_ + _)
    scored
      .withColumn("__c45f_noob", nOob)
      .filter(col("__c45f_noob") > 0)
      .withColumn("__c45f_vote", voteColumn(preds.map(col), oob))
      .groupBy(col(actualCol).cast("string").as("actual"),
        col("__c45f_vote").as("oob_prediction"))
      .agg(count(lit(1L)).as("n"))
  }
}

/** Bagged C4.5, fit FUSED: all `nTrees` bootstrap replicates train from
  * ONE bounded histogram job per level — the same (tree, rule, attr,
  * value, class) → Σweight aggregation shape as the fused k-fold fit
  * ([[C45.fitFolds]]), with the per-(row, tree) integer bootstrap
  * multiplicity riding as the weight instead of a fold exclusion.
  *
  * Bootstrap weights are DETERMINISTIC Poisson(1) draws (the standard
  * streaming/distributed bootstrap — Oza & Russell 2001; at n rows a
  * Poisson(1) multiplicity vector is the n→∞ limit of multinomial
  * bagging): w(row, t) = InverseCDF_Poisson(1)(u) where u is a 60-bit
  * md5 hash of (seed, t, row key) scaled to [0,1) — a pure function of
  * the row's key, so any replica of the data computes the same sample
  * with no RNG state, no shuffle, and exact replay in the DuckDB
  * oracle (the same md5 mirror as [[graft.functions.Hashing.hash60]]).
  * Weights are materialized ONCE into the fit's cached projection (T
  * long columns); each level reads them back with one element_at.
  *
  * Scale shape: the per-level histogram explodes each cached row to
  * its in-bag trees (E[#] = (1 − e⁻¹)·T ≈ 0.63·T) × its live
  * attributes, then partial-aggregates map-side, so the shuffle is
  * O(model), never O(data) — the single-tree fit's bound times the
  * ensemble width. Routing is the flat first-match CASE WHEN per tree
  * ([[C45.flatRidColumn]], the fused fold fit's unweighted path):
  * bagged C4.5 ensembles are depth-bounded by construction here
  * (params.base.maxDepth), which keeps the per-tree expression inside
  * whole-stage codegen.
  *
  * With `base.missingMode = "fractional"` on a null-bearing corpus,
  * the fit composes Quinlan's unknown-value distribution with the
  * bootstrap: histogram weights become per-copy micros × multiplicity
  * and ONLY the null-bearing rows ride a tree-tagged RouteX
  * broadcast-join chain (the fused fold fit's clean/dirty split,
  * [[C45.fitFolds]]) — a null-valued row descends every child of its
  * split at known-mass share with the single tree's exact micro
  * rounding applied to the PER-COPY weight (multiplicity multiplies
  * outside the rounding), while the null-free majority re-routes per
  * level through the flat per-tree rid CASE over the caller's cache.
  * Still ONE aggregation job per level; persisted chain state is
  * dirty × E[in-bag trees] rows per join-routed level. Decisions and
  * recorded masses stay bit-identical to a sequential
  * `C45.fit(missingMode = "fractional")` per explicitly-replicated
  * bootstrap sample (C45ForestSpec pins it), because the weight
  * expression, micro rounding, and driver math are the single fit's
  * shared code and integer sums commute.
  *
  * Numeric binning (`base.maxBins`) computes ONE shared set of
  * quantile edges from the FULL data (one probe + one approxQuantile
  * job, not T): a tree's in-bag sample sees a subset of the full value
  * set, so shared edges bound every tree's boundary window identically
  * — a deliberate, documented divergence from per-replicate binning.
  *
  * Each tree's decisions replay [[C45.levelStats]]/[[C45.decideLevel]]
  * on its weighted cell slice — bit-identical to a sequential
  * [[C45.fit]] on the explicitly replicated bootstrap sample
  * (C45ForestSpec pins this), because integer weight sums are
  * order-independent and the driver math is shared code. Recorded
  * `leafMass`/`leafDist` are bootstrap-multiplicity micros (Σw × 10⁶
  * per leaf). */
object C45Forest {

  /** Cumulative Poisson(1) probabilities scaled to 2⁶⁰, k = 0..6:
    * `u < PoissonCum(k)` ⟺ the draw is ≤ k. Draws above k = 6
    * (p < 8.4e-5) clamp to 7 — exact replay matters more than the
    * vanishing tail. Thresholds are floor(c_k · 2⁶⁰) computed at
    * 50-digit precision, hard-coded so Spark and the SQL mirror can
    * never disagree. */
  val PoissonCum: Array[Long] = Array(
    424136118829305329L, // k=0  c=0.36787944117144233
    848272237658610659L, // k=1  c=0.7357588823428847
    1060340297073263324L, // k=2  c=0.9196986029286058
    1131029650211480879L, // k=3  c=0.9810118431238462
    1148701988496035267L, // k=4  c=0.9963401531726563
    1152236456152946145L, // k=5  c=0.9994058151824183
    1152825534095764625L) // k=6  c=0.9999167588507120

  /** The 60-bit uniform draw for (seed, tree, key): first 15 hex chars
    * of md5("seed|tree|key") as a long in [0, 2⁶⁰). Same construction
    * as [[graft.functions.Hashing.hash60]] with the tree id riding in
    * the salt — and the same exact SQL mirror ([[bootstrapUSql]]). */
  def bootstrapU(key: Column, tree: Column, seed: Int): Column =
    graft.functions.HexSlice60.slice(
      md5(concat(lit(s"$seed|"), tree.cast("string"), lit("|"), key)), 1)

  /** The Poisson(1) bootstrap multiplicity for (seed, tree, key). */
  def bootstrapWeight(key: Column, tree: Column, seed: Int): Column = {
    val u = bootstrapU(key, tree, seed)
    PoissonCum.zipWithIndex.tail.foldLeft(
      when(u < PoissonCum(0), 0)) { case (acc, (t, k)) =>
      acc.when(u < t, k)
    }.otherwise(7)
  }

  /** SQL mirror of [[bootstrapU]] for the DuckDB oracle. */
  def bootstrapUSql(keyExpr: String, tree: Int, seed: Int): String =
    s"CAST(('0x' || substr(md5(concat('$seed|$tree|', $keyExpr)), 1, 15)) " +
      "AS BIGINT)"

  /** SQL mirror of the out-of-bag indicator (weight = 0). */
  def oobSql(keyExpr: String, tree: Int, seed: Int): String =
    s"(${bootstrapUSql(keyExpr, tree, seed)} < ${PoissonCum(0)})"

  /** Inverse of [[C45Forest.save]]. */
  def load(spark: org.apache.spark.sql.SparkSession, dir: String,
           schema: C45Schema): C45Forest = {
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(dirPath, "forest.txt"))
    val line = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val Array(n, s) = line.trim.split(",")
    C45Forest((0 until n.toInt).map(t => C45Model.load(spark,
      new org.apache.hadoop.fs.Path(dirPath, s"t$t").toString, schema))
      .toVector, s.toInt)
  }

  /** Attribute indices tree `t` may split on (rotating subspace). */
  def attrSubset(t: Int, d: Int, attrsPerTree: Int): Set[Int] =
    if (attrsPerTree <= 0 || attrsPerTree >= d) (0 until d).toSet
    else (0 until d).filter(i => (i + t) % d < attrsPerTree).toSet

  /** The deterministic per-NODE feature sample (Breiman 2001's mtry):
    * the `m` live attribute indices with the smallest
    * md5("seed|tree|level|rid|aid") digests (hex order, aid
    * tie-break) — a pure driver-side function of the node's identity,
    * so any replay of the fit draws the identical sample with no RNG
    * state. `m <= 0` or `m >= live.size` keeps every live attr. */
  def mtrySample(live: Seq[Int], m: Int, seed: Int, tree: Int,
                 level: Int, rid: Int): Set[Int] =
    if (m <= 0 || m >= live.size) live.toSet
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      // digest once per aid (sortBy re-applies its key per comparison)
      val keys: Map[Int, String] = live.map { aid =>
        val d = md.digest(s"$seed|$tree|$level|$rid|$aid".getBytes("UTF-8"))
        aid -> d.map("%02x".format(_)).mkString
      }.toMap
      live.sortBy(aid => (keys(aid), aid)).take(m).toSet
    }

  /** Fit the ensemble. `key` must be a deterministic string-valued
    * expression over `df`'s columns (duplicate keys share a weight —
    * acceptable: the weight stays a pure row function). */
  def fit(df: DataFrame, schema: C45Schema, key: Column,
          params: C45ForestParams = C45ForestParams()): C45Forest =
    fitWithImportance(df, schema, key, params)._1

  /** [[fit]], additionally returning each tree's gain-based feature
    * importance (attr index → Σ node-mass × gain over the splits that
    * chose it, in bootstrap-weight units — the per-tree analogue of
    * [[C45.fitWithImportance]], free from the same driver-side
    * decision pass). The classic random-forest importance is the
    * per-attribute MEAN across trees. */
  def fitWithImportance(df: DataFrame, schema: C45Schema, key: Column,
      params: C45ForestParams = C45ForestParams())
      : (C45Forest, Vector[Map[Int, Double]]) = {
    val spark = df.sparkSession
    val names = schema.attrNames
    val clsCol = schema.classCol
    val catAttrs = schema.categoricalAttrs
    val numAttrs = schema.numericAttrs
    val d = names.size
    val T = params.nTrees
    require(params.attrsPerTree <= d,
      s"attrsPerTree ${params.attrsPerTree} exceeds attribute count $d")
    val wCols = (0 until T).map(t => s"__fw$t")

    // one cached projection: attrs + class + the T materialized
    // bootstrap weights (so the level loop never recomputes md5);
    // callers that pre-persisted keep their cache — the weight
    // columns are then computed per level ON TOP of that cache
    // (projection over a cache is cheap; md5 × T per row per level is
    // the price of not double-caching the corpus)
    val prePersisted = df.storageLevel != StorageLevel.NONE ||
      C45.inputCacheBacked(df)
    val proj = df.select((names :+ clsCol).map(col) ++
      (0 until T).map(t =>
        bootstrapWeight(key, lit(t), params.seed).as(wCols(t))): _*)
    val data = if (prePersisted) proj
      else graft.operators.Widen.toParallelism(proj)
        .persist(StorageLevel.MEMORY_AND_DISK)
    try {

    // up-front probes in ONE agg job, mirroring C45.fit: non-null
    // class labels, the binning gate's approx-distinct sketches, and
    // (fractional mode) whether any row carries a null attribute value
    // — the fractional machinery engages only when nulls occur at all,
    // so a null-free corpus takes the drop path bit-for-bit
    val dirtyCol: Column = names.map(col(_).isNull)
      .reduceOption(_ || _).getOrElse(lit(false))
    val dcAggs =
      if (params.base.maxBins <= 0) Seq.empty
      else numAttrs.map(a =>
        approx_count_distinct(col(a.name)).as(s"__dc_${a.name}"))
    val dirtyAggs =
      if (params.base.missingMode != "fractional") Seq.empty
      else Seq(count(when(dirtyCol, 1)).as("__dirty"))
    val probeAggs =
      Seq(count(when(col(clsCol).isNull, 1)).as("cls")) ++ dcAggs ++ dirtyAggs
    val probe = data.agg(probeAggs.head, probeAggs.tail: _*).head()
    require(probe.getLong(0) == 0L,
      s"C45Forest.fit requires non-null class labels: column '$clsCol' " +
        "contains NULLs")
    val fractional = params.base.missingMode == "fractional" &&
      names.nonEmpty && probe.getAs[Long]("__dirty") > 0L
    // fractional masses ride in micros (multiplicity × 10⁶); drop-mode
    // cells stay raw multiplicities and decideLevel scales the record
    val unit = if (fractional) 1e6 else 1.0
    val W1 = 1000000L

    val classLabels: Seq[String] =
      if (schema.classLabels.nonEmpty) schema.classLabels
      else data.select(col(clsCol).cast("string")).na.drop().distinct()
        .collect().map(_.getString(0)).sorted.toSeq

    // shared quantile edges (see scaladoc): full-data approxQuantile
    // through the same API/snap expression as the single-tree fit
    val binEdges: Map[Int, Array[Double]] =
      if (params.base.maxBins <= 0 || numAttrs.isEmpty) Map.empty
      else {
        val need = numAttrs.filter(a =>
          probe.getAs[Long](s"__dc_${a.name}") > params.base.maxBins)
        if (need.isEmpty) Map.empty
        else {
          val probs = (1 until params.base.maxBins)
            .map(_.toDouble / params.base.maxBins).toArray
          val qs = data.stat.approxQuantile(need.map(_.name).toArray, probs, 1e-4)
          need.map(_.name).zip(qs).collect {
            case (nm, es) if es.nonEmpty =>
              schema.attrIndex(nm) -> es.distinct.sorted
          }.toMap
        }
      }
    def numValCol(a: graft.meta.AttrMeta): Column = {
      val raw = col(a.name).cast("double")
      binEdges.get(schema.attrIndex(a.name))
        .map(e => graft.functions.SortedCeilSnap.snapTo(e, raw))
        .getOrElse(raw)
    }

    val subsets: IndexedSeq[Set[Int]] =
      (0 until T).map(t => attrSubset(t, d, params.attrsPerTree))

    final class TState {
      var open: Vector[Rule] = Vector(Rule.root)
      var closed: Vector[Rule] = Vector.empty
      var closedMass: Vector[Long] = Vector.empty
      var closedDist: Vector[Map[String, Long]] = Vector.empty
      var globalMajority: Option[String] = None
      var routesX: Seq[RouteX] = Nil
      // previous level's routes + cells: the final level closes on
      // derived class marginals with no histogram job (drop mode —
      // C45.deriveFinalCounts)
      var routes: Seq[Route] = Nil
      var cells: Array[(Int, Int, String, String, Long)] = null
      val imp = scala.collection.mutable.Map.empty[Int, Double]
        .withDefaultValue(0.0)
    }
    val state = Array.fill(T)(new TState)
    val sc = spark.sparkContext
    // per-level wall diagnostics — the same GRAFT_FIT_PROFILE switch
    // as C45.fit / fitFolds / C45Boost
    val profile = sys.props.get("graft.fit.profile").contains("1") ||
      sys.env.get("GRAFT_FIT_PROFILE").contains("1")
    // fractional routing state, mirroring C45.fitFolds': the previous
    // level's fused DIRTY routed base (null-bearing rows only — see the
    // histogram branch below) and the persisted handle to free once the
    // next level materializes
    var prevBase: DataFrame = null
    var prevPersisted: Option[DataFrame] = None
    val routedPersists = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    try {
    var level = 0
    while (state.exists(_.open.nonEmpty) && level <= params.base.maxDepth) {
      val active = (0 until T).filter(t => state(t).open.nonEmpty)
      if (!fractional && level == params.base.maxDepth && level > 0 &&
          active.forall(t => state(t).cells != null)) {
        // final level, drop mode: every open rule of every tree closes
        // on its class marginal, derived exactly from that tree's
        // parent cells — the widest fused histogram job is skipped
        active.foreach { t =>
          val s = state(t)
          val st = C45.LevelStats(C45.deriveFinalCounts(s.cells, s.routes),
            Map.empty, Map.empty, Map.empty)
          val dec = C45.decideLevel(s.open, level, st, schema, params.base,
            classLabels, fractional, unit, s.globalMajority)
          dec.closedAdd.foreach { case (r, m, dd) =>
            s.closed :+= r; s.closedMass :+= m; s.closedDist :+= dd }
          dec.importanceAdd.foreach { case (aid, v) => s.imp(aid) += v }
          s.globalMajority = dec.globalMajority
          s.open = dec.nextOpen
        }
        level += 1
      } else {
      // per-tree histogram map over its LIVE attrs: the tree's subspace
      // minus the attrs used on every open path (candidates the
      // decision pass would reject anyway), plus the aid=-1 class
      // marginal slice
      def pairsFor(aids: Int => Boolean): Seq[Column] = {
        // final level: only the class marginal is consumed (every open
        // rule closes on depth) — skip the attribute slices outright
        if (level == params.base.maxDepth)
          return Seq(lit(-1), col("__cls"))
        val liveCat = catAttrs.filter(a => aids(schema.attrIndex(a.name)))
        val liveNum = numAttrs.filter(a => aids(schema.attrIndex(a.name)))
        Seq(lit(-1), col("__cls")) ++
          liveCat.flatMap(a =>
            Seq(lit(schema.attrIndex(a.name)), col(a.name).cast("string"))) ++
          liveNum.flatMap(a => Seq(lit(schema.attrIndex(a.name)),
            numValCol(a).cast("string")))
      }
      val attrMaps: Seq[(Int, Column)] = active.map { t =>
        if (params.mtry <= 0) {
          val deadAids = state(t).open.map(_.usedAttrs).reduce(_ intersect _)
          (t, map(pairsFor(aid => subsets(t)(aid) && !deadAids(aid)): _*))
        } else {
          // per-NODE sampling: one map per open rid (keyed on the
          // routed __rid), each holding only that node's md5-drawn
          // candidate attrs + the aid=-1 class marginal — unsampled
          // attrs never even reach the histogram shuffle
          val chain = state(t).open.zipWithIndex.map { case (r, rid) =>
            val live = (0 until d).filter(aid =>
              subsets(t)(aid) && !r.usedAttrs(aid))
            val sampled = mtrySample(live, params.mtry, params.seed,
              t, level, rid)
            (rid, map(pairsFor(sampled): _*))
          }
          (t, chain.tail.foldLeft(
            when(col("__rid") === chain.head._1, chain.head._2)) {
            case (acc, (rid, m)) => acc.when(col("__rid") === rid, m)
          })
        }
      }
      val mapByTree: Column =
        if (attrMaps.size == 1) attrMaps.head._2
        else attrMaps.tail.foldLeft(
          when(col("__tree") === attrMaps.head._1, attrMaps.head._2)) {
          case (acc, (t, m)) => acc.when(col("__tree") === t, m)
        }
      val ridPairs: Seq[Column] = active.flatMap { t =>
        Seq(lit(t), C45.flatRidColumn(state(t).open, names))
      }
      val wByTree = element_at(
        array(wCols.map(col): _*), col("__tree") + 1)
      val prevDesc = sc.getLocalProperty("spark.job.description")
      sc.setJobDescription(s"graft.fitForest level=$level T=$T histogram")
      val tLevel0 = System.nanoTime()
      def groupRows(rows: Array[org.apache.spark.sql.Row])
          : Map[Int, Array[(Int, Int, String, String, Long)]] =
        rows.groupBy(_.getInt(0)).view.mapValues(_.map(r =>
          (r.getInt(1), r.getInt(2), r.getString(3), r.getString(4),
            r.getLong(5)))).toMap
      // the level-0 fan-out base of the DIRTY rows (fractional mode):
      // one row per (null-bearing row, in-bag tree) at root rid. The
      // chain tracks the PER-COPY micro weight `__w` (starts at 10⁶;
      // the only column the RouteX rounding touches) and the integer
      // bootstrap multiplicity `__m` SEPARATELY — the histogram weighs
      // by __w × __m, so every micro rounding happens exactly as it
      // would on each replicated copy (floor(10⁶·frac + 0.5) · m, NOT
      // floor(m·10⁶·frac + 0.5)) and the fit stays bit-identical to
      // the sequential fractional fit on the replicated sample. Lazy:
      // level 0 reads it through the cached projection; only
      // join-routed levels persist their output.
      def rootFanout: DataFrame = data
        .filter(dirtyCol)
        .withColumn("__cls", col(clsCol).cast("string"))
        .select((Seq(col("__cls")) ++ names.map(col) ++ wCols.map(col) :+
          explode(array((0 until T).map(lit(_)): _*)).as("__tree")): _*)
        .withColumn("__m", wByTree)
        .filter(col("__m") > 0)
        .withColumn("__w", lit(W1))
        .withColumn("__rid", lit(0))
        .select(col("__tree") +: col("__rid") +: col("__w") +: col("__m") +:
          col("__cls") +: names.map(col): _*)
      val cellsByTree: Map[Int, Array[(Int, Int, String, String, Long)]] =
        try {
          if (!fractional) {
            data
              .withColumn("__cls", col(clsCol).cast("string"))
              .select((Seq(col("__cls")) ++ names.map(col) ++ wCols.map(col) :+
                explode(map(ridPairs: _*)).as(Seq("__tree", "__rid"))): _*)
              .filter(col("__rid") >= 0)
              .withColumn("__w", wByTree)
              .filter(col("__w") > 0)
              .select(col("__tree"), col("__rid"), col("__cls").as("cls"),
                col("__w"), explode(mapByTree).as(Seq("aid", "val")))
              .filter(col("val").isNotNull)
              .groupBy("__tree", "__rid", "aid", "val", "cls")
              .agg(sum(col("__w")).as("cnt"))
              .collect()
              .groupBy(_.getInt(0)).view.mapValues(_.map(r =>
                (r.getInt(1), r.getInt(2), r.getString(3), r.getString(4),
                  r.getLong(5)))).toMap
          } else {
            // fractional mode — the fused fold fit's CLEAN/DIRTY split
            // (C45.fitFolds) with the TREE tag riding the chain: only
            // null-bearing rows can fan out, so only they ride the
            // weighted RouteX broadcast-join chain (persisted state
            // dirty×E[in-bag trees] per join-routed level); the
            // null-free majority re-routes per level through the flat
            // per-tree rid CASE over the caller's cache at weight
            // multiplicity × 10⁶. One union, ONE aggregation job per
            // level — exact long sums, order-independent.
            import spark.implicits._
            val base =
              if (level == 0) rootFanout
              else {
                val xr = active.flatMap(t => state(t).routesX.map(x =>
                  (t, x.prid, x.kind, x.aid, x.boundary, x.side, x.catval,
                    x.crid, x.frac)))
                val routeDf = xr.toDF("__ptree", "__prid", "__kind", "__aid",
                  "__boundary", "__side", "__catval", "__crid", "__frac")
                val routeAids = xr.map(_._4).toSet
                val routeNum = numAttrs.filter(a =>
                  routeAids(schema.attrIndex(a.name)))
                val routeCat = catAttrs.filter(a =>
                  routeAids(schema.attrIndex(a.name)))
                prevBase
                  .join(broadcast(routeDf),
                    prevBase("__tree") === routeDf("__ptree") &&
                      prevBase("__rid") === routeDf("__prid"))
                  .withColumn("__wN", C45.routeXWeight(routeNum, routeCat, schema))
                  .filter(col("__wN").isNotNull && col("__wN") > 0)
                  .drop("__rid", "__w", "__ptree", "__prid", "__kind", "__aid",
                    "__boundary", "__side", "__catval", "__frac")
                  .withColumnRenamed("__crid", "__rid")
                  .withColumnRenamed("__wN", "__w")
              }
            val based =
              if (level >= 1 && level < params.base.maxDepth) {
                val p = C45.persistUncompressed(base); routedPersists += p; p
              } else base
            val dirtySide = based
              .select(col("__tree"), col("__rid"), col("__cls").as("cls"),
                (col("__w") * col("__m")).as("__w"),
                explode(mapByTree).as(Seq("aid", "val")))
            val cleanSide = data
              .filter(!dirtyCol)
              .withColumn("__cls", col(clsCol).cast("string"))
              .select((Seq(col("__cls")) ++ names.map(col) ++ wCols.map(col) :+
                explode(map(ridPairs: _*)).as(Seq("__tree", "__rid"))): _*)
              .filter(col("__rid") >= 0)
              .withColumn("__w", wByTree * lit(W1))
              .filter(col("__w") > 0)
              .select(col("__tree"), col("__rid"), col("__cls").as("cls"),
                col("__w"), explode(mapByTree).as(Seq("aid", "val")))
            val rows = dirtySide.unionByName(cleanSide)
              .filter(col("val").isNotNull)
              .groupBy("__tree", "__rid", "aid", "val", "cls")
              .agg(sum(col("__w")).as("cnt"))
              .collect()
            prevPersisted.foreach(_.unpersist())
            prevPersisted =
              if (level >= 1 && level < params.base.maxDepth) Some(based)
              else None
            prevBase = based
            groupRows(rows)
          }
        } finally sc.setJobDescription(prevDesc)
      if (profile)
        println(f"[fitForest] level=$level trees=${active.size} " +
          f"cells=${cellsByTree.values.map(_.length).sum} " +
          f"hist=${(System.nanoTime() - tLevel0) / 1e9}%.2fs")
      active.foreach { t =>
        val s = state(t)
        val cells = cellsByTree.getOrElse(t, Array.empty[(Int, Int, String, String, Long)])
        val st = C45.levelStats(cells, schema, classLabels,
          fractional, unit, params.base)
        val dec = C45.decideLevel(s.open, level, st, schema, params.base,
          classLabels, fractional, unit, s.globalMajority)
        dec.closedAdd.foreach { case (r, m, dd) =>
          s.closed :+= r; s.closedMass :+= m; s.closedDist :+= dd }
        dec.importanceAdd.foreach { case (aid, v) => s.imp(aid) += v }
        s.globalMajority = dec.globalMajority
        s.open = dec.nextOpen
        s.routesX = dec.routesX
        s.routes = dec.routes
        s.cells = cells
      }
      level += 1
      }
    }
    } finally routedPersists.foreach(_.unpersist())
    (C45Forest((0 until T).map { t =>
      val s = state(t)
      s.open.foreach { r =>
        s.closed :+= r.closed(s.globalMajority.getOrElse(classLabels.head))
        s.closedMass :+= 0L
        s.closedDist :+= Map.empty
      }
      C45Model(schema.copy(classLabels = classLabels), s.closed,
        s.globalMajority.getOrElse(classLabels.head), s.closedMass,
        s.closedDist)
    }.toVector, params.seed),
      state.map(_.imp.toMap).toVector)
    } finally if (!prePersisted) data.unpersist()
  }
}
