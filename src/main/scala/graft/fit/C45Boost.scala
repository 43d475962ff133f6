package graft.fit

import graft.meta.C45Schema
import graft.model.Rule
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Tuning knobs for [[C45Boost.fit]] — AdaBoost.M1 (Freund & Schapire
  * 1996) with shallow C4.5 base learners, the pairing Quinlan studied
  * in "Bagging, boosting, and C4.5" (AAAI 1996). `rounds` caps the
  * boosting iterations (the loop also stops on ε = 0 or ε ≥ 0.5, the
  * M1 conditions); `base.maxDepth` keeps the weak learners weak
  * (default 2 — near-stumps); `base.missingMode` picks the null-value
  * semantics of each weak fit: "drop" (a null attribute value leaves
  * each histogram slice and routes to no leaf) or "fractional"
  * (canonical C4.5 unknown-value distribution, composed with the boost
  * weight: a null-valued row descends every child with weight
  * boost-micros × known-mass share, the same half-up micro rounding
  * as the single tree's RouteX path). Serving and the per-round
  * error/reweight pass stay on [[C45Model.transform]]'s deterministic
  * hard routing (a null on the path falls to the majority), exactly
  * like the cross-validation eval contract. */
case class C45BoostParams(rounds: Int = 5,
                          base: C45Params = C45Params(maxDepth = 2,
                            missingMode = "drop")) {
  require(rounds >= 1, s"rounds must be >= 1: $rounds")
}

/** A fitted AdaBoost.M1 ensemble: `trees(t)` with vote weight
  * `alphaMicros(t)` = floor(ln((1−ε_t)/ε_t)·10⁶) and recorded training
  * error `errorMicros(t)` = ε_t·10⁶ rounded HALF-UP on the exact
  * integer masses ((e·10⁶ + w/2) div w — the same rounding the
  * reweight uses; alpha alone floors). Both exact longs so goldens pin
  * float-free. Serving is the weighted vote:
  * argmax over labels of Σ_t α_t·[h_t(x) = label], ties to the
  * lexicographically smallest label — T flat CASE WHEN columns + one
  * pure-Column argmax, zero joins, zero shuffles. */
case class C45Boost(trees: Vector[C45Model], alphaMicros: Vector[Long],
                    errorMicros: Vector[Long]) {

  /** Sorted union of the member trees' class labels. */
  def labels: Seq[String] =
    trees.flatMap(_.schema.classLabels).distinct.sorted

  /** The ONE weight vector every serving path votes with: α-micros,
    * except the degenerate Σα = 0 ensemble (every kept round floored
    * its α to 0) falls back to unit weights — so the hard vote and
    * [[transformProba]]'s probability shares can never contradict each
    * other in the same output row (r20 ADVICE: the fallback previously
    * applied to the shares only, leaving the hard vote an all-zero tie
    * to the smallest label). Non-degenerate ensembles are untouched. */
  private lazy val serveWeights: Vector[Long] =
    if (alphaMicros.sum > 0) alphaMicros else alphaMicros.map(_ => 1L)

  /** The α-weighted vote over the member prediction columns `preds`
    * (restricted to the first `upTo` rounds — the staged-diagnostic
    * hook), ties to the lexicographically smallest label. */
  private def voteColumn(preds: Seq[String], upTo: Int): Column = {
    val ls = labels
    if (ls.size == 1) return lit(ls.head)
    greatest(ls.zipWithIndex.map { case (l, i) =>
      val mass = (0 until upTo).map(t =>
        when(col(preds(t)) === lit(l), lit(serveWeights(t)))
          .otherwise(lit(0L))).reduce(_ + _)
      struct(mass.as("m"), lit(ls.size - i).as("r"), lit(l).as("l"))
    }: _*).getField("l")
  }

  /** Score `df`: adds `outputCol` with the α-weighted vote label. */
  def transform(df: DataFrame, outputCol: String = "prediction"): DataFrame = {
    val preds = trees.indices.map(t => s"__c45b_p$t")
    val scored = trees.indices.foldLeft(df)((d, t) =>
      trees(t).transform(d, preds(t)))
    scored.withColumn(outputCol, voteColumn(preds, trees.size))
      .drop(preds: _*)
  }

  /** Score `df` with class-membership probabilities: `outputCol` is
    * the hard α-weighted vote (exactly [[transform]]'s estimator), and
    * each `probPrefix<class>` column is the class's NORMALIZED vote
    * mass share in EXACT integer micros —
    * `floorDiv(mass_c·10⁶ + Σα/2, Σα)` where `mass_c = Σ_t α_t·[h_t(x)
    * = c]` and Σα is a driver-side constant. Integral `div` keeps the
    * half-up rounding exact (the products stay orders of magnitude
    * below 2⁶³: each α ≤ ln(total weight mass)·10⁶ — a few tens of
    * millions even at 10¹² training rows); shares sum to 10⁶ ±
    * (#classes−1) from rounding, mirroring [[C45Model.transformProba]]'s
    * contract. Pure flat Columns — zero joins, zero shuffles.
    *
    * Degenerate Σα = 0 (every kept round floored its α to 0 — ε
    * marginally below 0.5 on a huge corpus) falls back to UNWEIGHTED
    * vote-count shares (each round votes 1 micro-unit) instead of
    * throwing: the hard vote column is already tie-broken
    * deterministically, and a fitted ensemble must stay servable. */
  def transformProba(df: DataFrame, outputCol: String = "prediction",
                     probPrefix: String = "p_"): DataFrame = {
    val preds = trees.indices.map(t => s"__c45b_p$t")
    val scored = trees.indices.foldLeft(df)((d, t) =>
      trees(t).transform(d, preds(t)))
    val ls = labels
    val weights = serveWeights
    val sumA = weights.sum
    val withVote = scored.withColumn(outputCol, voteColumn(preds, trees.size))
    val out = ls.foldLeft(withVote) { (d, l) =>
      val mass = trees.indices.map(t =>
        when(col(preds(t)) === lit(l), lit(weights(t)))
          .otherwise(lit(0L))).reduce(_ + _)
      d.withColumn("__c45b_m", mass)
        .withColumn(s"$probPrefix$l",
          expr(s"(__c45b_m * 1000000 + ${sumA / 2}) div $sumA"))
        .drop("__c45b_m")
    }
    out.drop(preds: _*)
  }

  /** Missing-value serving — each weak learner scores through its OWN
    * [[C45Model.transformFractional]] (null split values descend every
    * child weighted by fit-recorded leaf masses), then the α-weighted
    * vote combines the per-round predictions exactly as [[transform]]
    * does. Null-free rows get [[transform]]'s answer bit-for-bit. */
  def transformFractional(df: DataFrame,
                          outputCol: String = "prediction"): DataFrame = {
    val preds = trees.indices.map(t => s"__c45b_p$t")
    val scored = trees.indices.foldLeft(df)((d, t) =>
      trees(t).transformFractional(d, preds(t)))
    scored.withColumn(outputCol, voteColumn(preds, trees.size))
      .drop(preds: _*)
  }

  /** The standard AdaBoost diagnostic — error vs rounds: the confusion
    * counts of every PREFIX ensemble 1..T, from ONE scoring pass.
    * Staged predictions are free: each prefix's vote masses are prefix
    * sums of the same per-tree CASE WHEN columns, so the plan is T
    * flat vote columns + one posexplode + one tiny aggregation.
    * Returns `(stage, actual, prediction, n)` where stage k uses
    * rounds 0..k-1. */
  def stagedConfusion(df: DataFrame, actualCol: String): DataFrame = {
    val preds = trees.indices.map(t => s"__c45b_p$t")
    val scored = trees.indices.foldLeft(df)((d, t) =>
      trees(t).transform(d, preds(t)))
    val votes = (1 to trees.size).map(k => voteColumn(preds, k))
    scored
      .select(col(actualCol).cast("string").as("actual"),
        posexplode(array(votes: _*)).as(Seq("__k", "prediction")))
      .groupBy((col("__k") + 1).as("stage"), col("actual"),
        col("prediction"))
      .agg(count(lit(1L)).as("n"))
  }

  /** FULL ensemble persistence, mirroring [[C45Forest.save]]'s layout:
    * one [[C45Model.save]] directory per round (`dir/t<i>/` — reference
    * text codec + parquet distribution sidecar) plus a `boost.txt`
    * manifest (line 0 the round count, then one `alpha,error` micros
    * line per round), all through the Hadoop FileSystem API so any
    * save-visible path (local, HDFS, s3a) works. [[C45Boost.load]]
    * restores an ensemble whose vote, probabilities, and staged
    * diagnostics are bit-identical to the live fit's
    * (q_boost_roundtrip gates this). */
  def save(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dirPath)
    val manifest = (trees.size.toString +:
      trees.indices.map(t => s"${alphaMicros(t)},${errorMicros(t)}"))
      .mkString("\n")
    val out = fs.create(
      new org.apache.hadoop.fs.Path(dirPath, "boost.txt"), true)
    try out.write(manifest.getBytes("UTF-8"))
    finally out.close()
    trees.zipWithIndex.foreach { case (m, t) =>
      m.save(spark, new org.apache.hadoop.fs.Path(dirPath, s"t$t").toString)
    }
  }
}

/** AdaBoost.M1 over the engine's C4.5, all-integer where it counts:
  *
  * - **Weights are exact long micros** (1 row starts at 10⁶) and ride
  *   as ONE column on the persisted training projection. Each round's
  *   weighted histogram is the forest/crossval aggregation shape —
  *   explode to (rid, attr, value, class), partial-aggregate
  *   Σ weight map-side — so the per-round shuffle stays O(model);
  *   split math reuses [[C45.levelStats]]/[[C45.decideLevel]] in
  *   their exact-micros weighted mode (the fused fractional fold
  *   fit's path), so a weighted tree is bit-deterministic under any
  *   partitioning.
  * - **The M1 reweight is the Σ-preserving normalized form** —
  *   wrong rows × W/(2E), right rows × W/(2(W−E)) (E = weighted
  *   error mass, W = total mass) — applied as exact long
  *   micro-factors with half-up rounding. This form is
  *   overflow-safe by construction: a wrong row's mass is ≤ E, so
  *   w·fWrong ≤ W·10⁶/2 (and symmetrically for right rows) — still,
  *   the round's agg records max(w) and the fit aborts loudly if a
  *   product could exceed Long.MaxValue rather than wrapping.
  * - **Stopping**: ε = 0 (the tree is kept with α = ln(10⁶)·10⁻⁶ ≈
  *   13.8, the exact-micros stand-in for "perfect") and ε ≥ 0.5 (the
  *   tree is discarded) both end the loop — Freund & Schapire's M1
  *   conditions.
  *
  * Scale shape per round: one weighted histogram job per tree level +
  * one score/error/reweight pass that re-persists rows×(attrs+1)
  * (boosting is inherently sequential — each round's weights depend
  * on the previous round's predictions; that rewrite is the honest
  * algorithmic cost, there is no bagging-style fusion). Total:
  * rounds × (levels + 2) bounded-shuffle jobs. */
object C45Boost {

  private val W1 = 1000000L

  /** α for a perfect round (ε = 0): ln(10⁶) in micros. */
  val AlphaPerfectMicros: Long = math.floor(math.log(1e6) * 1e6).toLong

  /** Inverse of [[C45Boost.save]]: per-round trees through
    * [[C45Model.load]] (rules + distribution sidecars), α/ε micros from
    * the manifest. Reads through the Hadoop FileSystem API, so any
    * save-visible filesystem works. */
  def load(spark: org.apache.spark.sql.SparkSession, dir: String,
           schema: C45Schema): C45Boost = {
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(dirPath, "boost.txt"))
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toVector finally in.close()
    val n = lines.head.trim.toInt
    require(lines.size == n + 1,
      s"boost manifest $dir/boost.txt declares $n rounds but carries " +
        s"${lines.size - 1} alpha,error lines")
    val ae = lines.tail.zipWithIndex.map { case (l, i) =>
      val fs = l.trim.split(",")
      require(fs.length == 2,
        s"boost manifest $dir/boost.txt line ${i + 2}: expected " +
          s"'alpha,error', got '$l'")
      try (fs(0).toLong, fs(1).toLong)
      catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"boost manifest $dir/boost.txt line ${i + 2}: non-numeric " +
            s"alpha/error micros in '$l'")
      }
    }
    C45Boost((0 until n).map(t => C45Model.load(spark,
      new org.apache.hadoop.fs.Path(dirPath, s"t$t").toString, schema))
      .toVector, ae.map(_._1), ae.map(_._2))
  }

  def fit(df: DataFrame, schema: C45Schema,
          params: C45BoostParams = C45BoostParams()): C45Boost = {
    val spark = df.sparkSession
    val names = schema.attrNames
    val clsCol = schema.classCol
    val catAttrs = schema.categoricalAttrs
    val numAttrs = schema.numericAttrs

    // probes (one job): non-null labels + binning gate sketches +
    // (fractional mode) whether any row carries a null attribute value
    // — a null-free corpus takes the flat drop routing bit-for-bit
    val dirtyCol: Column = names.map(col(_).isNull)
      .reduceOption(_ || _).getOrElse(lit(false))
    val proj0 = df.select((names :+ clsCol).map(col): _*)
    val dcAggs =
      if (params.base.maxBins <= 0) Seq.empty
      else numAttrs.map(a =>
        approx_count_distinct(col(a.name)).as(s"__dc_${a.name}"))
    val dirtyAggs =
      if (params.base.missingMode != "fractional") Seq.empty
      else Seq(count(when(dirtyCol, 1)).as("__dirty"))
    val probeAggs =
      Seq(count(when(col(clsCol).isNull, 1)).as("cls")) ++ dcAggs ++ dirtyAggs
    val probe = proj0.agg(probeAggs.head, probeAggs.tail: _*).head()
    require(probe.getLong(0) == 0L,
      s"C45Boost.fit requires non-null class labels: column '$clsCol' " +
        "contains NULLs")
    val fractional = params.base.missingMode == "fractional" &&
      names.nonEmpty && probe.getAs[Long]("__dirty") > 0L
    val classLabels: Seq[String] =
      if (schema.classLabels.nonEmpty) schema.classLabels
      else proj0.select(col(clsCol).cast("string")).na.drop().distinct()
        .collect().map(_.getString(0)).sorted.toSeq

    // shared full-data quantile edges (the forest's binning contract)
    val binEdges: Map[Int, Array[Double]] =
      if (params.base.maxBins <= 0 || numAttrs.isEmpty) Map.empty
      else {
        val need = numAttrs.filter(a =>
          probe.getAs[Long](s"__dc_${a.name}") > params.base.maxBins)
        if (need.isEmpty) Map.empty
        else {
          val probs = (1 until params.base.maxBins)
            .map(_.toDouble / params.base.maxBins).toArray
          val qs = proj0.stat.approxQuantile(need.map(_.name).toArray, probs, 1e-4)
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

    /** one weighted C4.5 fit over (attrs, __cls, __w micros). In
      * fractional mode the null-bearing rows ride a per-round RouteX
      * broadcast-join chain (the fused fold fit's clean/dirty split,
      * C45.fitFolds) with the BOOST weight as the chain's starting
      * mass, so a null-valued row descends every child at
      * boost-micros × known-share; null-free rows re-route per level
      * through the flat rid CASE at their full weight. */
    def fitWeighted(base: DataFrame): C45Model = {
      var open = Vector(Rule.root)
      var closed = Vector.empty[Rule]
      var closedMass = Vector.empty[Long]
      var closedDist = Vector.empty[Map[String, Long]]
      var globalMajority: Option[String] = None
      var routesXPrev: Seq[RouteX] = Nil
      // previous level's routes + cells (drop mode): the final level
      // closes on derived class marginals with no histogram job
      // (C45.deriveFinalCounts; weighted sums derive exactly too)
      var routesPrev: Seq[Route] = Nil
      var prevCells: Array[(Int, Int, String, String, Long)] = null
      var prevBase: DataFrame = null
      var prevPersisted: Option[DataFrame] = None
      val routedPersists =
        scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      val spark = base.sparkSession
      import spark.implicits._
      var level = 0
      try {
      while (open.nonEmpty && level <= params.base.maxDepth) {
        if (!fractional && level == params.base.maxDepth && level > 0 &&
            prevCells != null) {
          // final level, drop mode: every open rule closes on its
          // weighted class marginal, derived exactly from the parent's
          // cells — one histogram job per round saved
          val st = C45.LevelStats(
            C45.deriveFinalCounts(prevCells, routesPrev),
            Map.empty, Map.empty, Map.empty)
          val dec = C45.decideLevel(open, level, st, schema, params.base,
            classLabels, fractional = true, unit = 1e6, globalMajority)
          dec.closedAdd.foreach { case (r, m, dd) =>
            closed :+= r; closedMass :+= m; closedDist :+= dd }
          globalMajority = dec.globalMajority
          open = dec.nextOpen
          level += 1
        } else {
        val deadAids = open.map(_.usedAttrs).reduce(_ intersect _)
        val liveCat = catAttrs.filterNot(a => deadAids(schema.attrIndex(a.name)))
        val liveNum = numAttrs.filterNot(a => deadAids(schema.attrIndex(a.name)))
        // final level: only the class marginal is consumed (every open
        // rule closes on depth) — skip the attribute slices outright
        val pairs: Seq[Column] =
          if (level == params.base.maxDepth) Seq(lit(-1), col("__cls"))
          else Seq(lit(-1), col("__cls")) ++
            liveCat.flatMap(a =>
              Seq(lit(schema.attrIndex(a.name)), col(a.name).cast("string"))) ++
            liveNum.flatMap(a => Seq(lit(schema.attrIndex(a.name)),
              numValCol(a).cast("string")))
        val cells =
          if (!fractional) {
            base
              .withColumn("__rid", C45.flatRidColumn(open, names))
              .filter(col("__rid") >= 0)
              .select(col("__rid"), col("__cls").as("cls"), col("__w"),
                explode(map(pairs: _*)).as(Seq("aid", "val")))
              .filter(col("val").isNotNull)
              .groupBy("__rid", "aid", "val", "cls")
              .agg(sum(col("__w")).as("cnt"))
              .collect()
              .map(r => (r.getInt(0), r.getInt(1), r.getString(2),
                r.getString(3), r.getLong(4)))
          } else {
            val chain =
              if (level == 0)
                base.filter(dirtyCol)
                  .withColumn("__rid", lit(0))
                  .select(col("__rid") +: col("__w") +: col("__cls") +:
                    names.map(col): _*)
              else {
                val routeDf = routesXPrev.map(x =>
                  (x.prid, x.kind, x.aid, x.boundary, x.side, x.catval,
                    x.crid, x.frac))
                  .toDF("__prid", "__kind", "__aid", "__boundary", "__side",
                    "__catval", "__crid", "__frac")
                val routeAids = routesXPrev.map(_.aid).toSet
                val routeNum = numAttrs.filter(a =>
                  routeAids(schema.attrIndex(a.name)))
                val routeCat = catAttrs.filter(a =>
                  routeAids(schema.attrIndex(a.name)))
                prevBase
                  .join(broadcast(routeDf),
                    prevBase("__rid") === routeDf("__prid"))
                  .withColumn("__wN",
                    C45.routeXWeight(routeNum, routeCat, schema))
                  .filter(col("__wN").isNotNull && col("__wN") > 0)
                  .drop("__rid", "__w", "__prid", "__kind", "__aid",
                    "__boundary", "__side", "__catval", "__frac")
                  .withColumnRenamed("__crid", "__rid")
                  .withColumnRenamed("__wN", "__w")
              }
            val based =
              if (level >= 1 && level < params.base.maxDepth) {
                val p = C45.persistUncompressed(chain); routedPersists += p; p
              } else chain
            val dirtySide = based
              .select(col("__rid"), col("__cls").as("cls"), col("__w"),
                explode(map(pairs: _*)).as(Seq("aid", "val")))
            val cleanSide = base
              .filter(!dirtyCol)
              .withColumn("__rid", C45.flatRidColumn(open, names))
              .filter(col("__rid") >= 0)
              .select(col("__rid"), col("__cls").as("cls"), col("__w"),
                explode(map(pairs: _*)).as(Seq("aid", "val")))
            val rows = dirtySide.unionByName(cleanSide)
              .filter(col("val").isNotNull)
              .groupBy("__rid", "aid", "val", "cls")
              .agg(sum(col("__w")).as("cnt"))
              .collect()
              .map(r => (r.getInt(0), r.getInt(1), r.getString(2),
                r.getString(3), r.getLong(4)))
            prevPersisted.foreach(_.unpersist())
            prevPersisted =
              if (level >= 1 && level < params.base.maxDepth) Some(based)
              else None
            prevBase = based
            rows
          }
        val st = C45.levelStats(cells, schema, classLabels,
          fractional = true, unit = 1e6, params.base)
        val dec = C45.decideLevel(open, level, st, schema, params.base,
          classLabels, fractional = true, unit = 1e6, globalMajority)
        dec.closedAdd.foreach { case (r, m, dd) =>
          closed :+= r; closedMass :+= m; closedDist :+= dd }
        globalMajority = dec.globalMajority
        open = dec.nextOpen
        routesXPrev = dec.routesX
        routesPrev = dec.routes
        prevCells = cells
        level += 1
        }
      }
      } finally routedPersists.foreach(_.unpersist())
      open.foreach { r =>
        closed :+= r.closed(globalMajority.getOrElse(classLabels.head))
        closedMass :+= 0L
        closedDist :+= Map.empty
      }
      C45Model(schema.copy(classLabels = classLabels), closed,
        globalMajority.getOrElse(classLabels.head), closedMass, closedDist)
    }

    val trees = Vector.newBuilder[C45Model]
    val alphas = Vector.newBuilder[Long]
    val errors = Vector.newBuilder[Long]
    var cur = graft.operators.Widen.toParallelism(
        proj0.withColumn("__cls", col(clsCol).cast("string"))
          .withColumn("__w", lit(W1)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // phase wall-clock diagnostics: GRAFT_FIT_PROFILE=1, same switch
    // as C45.fit / fitFolds / crossValidate
    val profile = sys.props.get("graft.fit.profile").contains("1") ||
      sys.env.get("GRAFT_FIT_PROFILE").contains("1")
    def tick[T](what: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      if (profile)
        println(f"[boost] $what: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    try {
      var round = 0
      var stop = false
      // the previous round's cache, freed only after the current
      // round's first histogram job has materialized `cur` on top of
      // it (lazy reweight materialization — see below)
      var pendingFree: Option[DataFrame] = None
      while (round < params.rounds && !stop) {
        val model = tick(s"round $round fit")(fitWeighted(cur))
        pendingFree.foreach(_.unpersist())
        pendingFree = None
        // score + error mass + total mass + max weight in ONE agg job
        val scored = model.transform(cur, "__pred")
        val wrong = col("__pred") =!= col("__cls")
        val r = tick(s"round $round eval")(scored.agg(
          sum(when(wrong, col("__w")).otherwise(lit(0L))).as("e"),
          sum(col("__w")).as("w"),
          max(col("__w")).as("mx")).head())
        val e = r.getLong(0); val w = r.getLong(1); val mx = r.getLong(2)
        if (e == 0L) {
          // perfect weak learner: keep with the exact-micros stand-in
          // for an unbounded alpha, then stop (M1)
          trees += model; alphas += AlphaPerfectMicros; errors += 0L
          stop = true
        } else if (2 * e >= w) {
          // ε >= 0.5: discard and stop (M1)
          stop = true
        } else {
          val alpha = math.floor(
            math.log((w - e).toDouble / e.toDouble) * 1e6).toLong
          trees += model; alphas += alpha
          errors += ((BigInt(e) * W1 + w / 2) / BigInt(w)).toLong
          // Σ-preserving M1 reweight as exact micro-factors; the
          // products are bounded (scaladoc) but verify loudly
          val fWrong = BigInt(w) * W1 / (2 * BigInt(e))
          val fRight = BigInt(w) * W1 / (2 * (BigInt(w) - BigInt(e)))
          require(fWrong * mx + W1 / 2 < BigInt(Long.MaxValue) &&
            fRight * mx + W1 / 2 < BigInt(Long.MaxValue),
            s"boost reweight would overflow long micros (round $round: " +
              s"max weight $mx, factors $fWrong/$fRight) — reduce rounds " +
              "or rebalance the corpus")
          // integral `div` keeps the half-up rounding EXACT at any
          // magnitude (a double-backed `/` would round the >2^53
          // numerator before dividing)
          val next = scored
            .withColumn("__wn",
              col("__w") * when(wrong, lit(fWrong.toLong))
                .otherwise(lit(fRight.toLong)) + lit(W1 / 2))
            .withColumn("__w", expr(s"__wn div $W1"))
            .drop("__pred", "__wn")
            .persist(StorageLevel.MEMORY_AND_DISK)
          // LAZY materialization: the next round's first histogram job
          // computes `next` straight through the still-cached parent —
          // the per-round count() job is gone, and the final round's
          // reweight (whose output no job ever reads) never executes.
          // The parent cache is freed right after that job (pendingFree).
          if (profile) println(s"[boost] round $round reweight: deferred")
          pendingFree = Some(cur)
          cur = next
        }
        round += 1
      }
      pendingFree.foreach(_.unpersist())
    } finally cur.unpersist()
    val ts = trees.result()
    require(ts.nonEmpty,
      "C45Boost.fit produced no usable tree (first round error >= 0.5)")
    C45Boost(ts, alphas.result(), errors.result())
  }
}
