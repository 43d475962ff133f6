package graft.fit

import graft.model.Rule
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4.5rules-style rule generalization — the OTHER post-processing half
  * of canonical C4.5 the reference omits (SURVEY.md §0 stops at the
  * grown tree; [[C45Pruning]] covers subtree replacement). Each
  * root-to-leaf rule is simplified independently: greedily drop the
  * condition whose removal yields the lowest Wilson pessimistic error
  * rate (same bound as pruning, CF = 0.25), as long as that rate is no
  * worse than the rule's current rate. Conditions the planted structure
  * actually needs survive (dropping them admits wrong-class rows);
  * conditions a noisy fit added survive only by chance at tiny n —
  * which the small-n penalty makes expensive — so noise conditions go.
  *
  * Scale shape: per greedy round, ONE conditional-aggregation Spark job
  * evaluates EVERY candidate of EVERY still-active rule — `count(when
  * (pred, 1))` column pairs over one map-side pass, partial-aggregated,
  * a single 1-row result per batch (batches of `batchSize` candidates
  * bound codegen size). No shuffle wider than the global agg, nothing
  * keyed on data. Rounds ≤ max rule depth; candidates per round ≤
  * Σ depth(rule) = O(model). All selection math is driver-side over
  * exact longs, ties broken by condition position — deterministic under
  * any partitioning.
  *
  * Simplified rules may overlap and no longer partition the space (the
  * canonical C4.5rules outcome): the returned model's `transform`
  * remains correct because its flat CASE WHEN is first-match, and
  * leaves are ordered best-rule-first (lowest pessimistic error rate,
  * then codec text). Exact-duplicate rules collapse to one. The
  * returned model carries per-rule FIRST-MATCH training distributions
  * (whole-row counts in exact micros — see the job comment in
  * [[simplify]]), so transformProba / C45Model.save / load round-trip;
  * subtree pruning stays tree-only ([[C45Pruning]] rejects overlapping
  * rule sets). */
object C45RuleSimplify {

  /** Evaluate (covered, correct) for each (predicate, label) candidate
    * in batched single-pass conditional aggregations. */
  private def coverage(df: DataFrame, clsCol: Column,
                       cands: Seq[(Column, String)],
                       batchSize: Int): Vector[(Long, Long)] =
    cands.grouped(batchSize).flatMap { grp =>
      val aggs = grp.zipWithIndex.flatMap { case ((p, l), i) =>
        Seq(count(when(p, 1)).as(s"n$i"),
          count(when(p && clsCol === lit(l), 1)).as(s"c$i"))
      }
      val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
      grp.indices.map(i => (row.getAs[Long](s"n$i"), row.getAs[Long](s"c$i")))
    }.toVector

  /** Simplify every leaf of `model` against (training) data `df`. */
  def simplify(model: C45Model, df: DataFrame,
               z: Double = C45Pruning.DefaultZ,
               batchSize: Int = 256): C45Model = {
    val names = model.schema.attrNames
    val cls = col(model.schema.classCol).cast("string")

    def rate(n: Long, correct: Long): Double =
      C45Pruning.upperErrorRate((n - correct).toDouble, n.toDouble, z)

    // (rule, its current pessimistic rate); rate of the untouched rule
    // is evaluated in round 1 alongside its first drop candidates.
    var active: Vector[(Rule, Double)] = Vector.empty
    var done = Vector.newBuilder[(Rule, Double)]

    // round 0: evaluate every original leaf once
    val leaves = model.leaves
    if (leaves.isEmpty) return model
    val baseCov = coverage(df, cls,
      leaves.map(r => (r.toPredicate(names), r.label.get)), batchSize)
    leaves.zip(baseCov).foreach { case (r, (n, c)) =>
      if (r.depth == 0) done += ((r, rate(n, c)))
      else active :+= ((r, rate(n, c)))
    }

    while (active.nonEmpty) {
      // all single-condition-drop candidates of all active rules
      val cands = active.flatMap { case (r, _) =>
        r.conditions.indices.map { i =>
          val dropped = r.copy(conditions =
            r.conditions.patch(i, Nil, 1))
          (r, i, dropped)
        }
      }
      val cov = coverage(df, cls,
        cands.map { case (_, _, d) => (d.toPredicate(names), d.label.get) },
        batchSize)
      val byRule = cands.zip(cov).groupBy(_._1._1)
      val next = Vector.newBuilder[(Rule, Double)]
      active.foreach { case (r, cur) =>
        val opts = byRule(r).map { case ((_, i, d), (n, c)) =>
          (rate(n, c), i, d)
        }
        // best drop: lowest pessimistic rate, earliest condition on tie
        val (bestRate, _, best) = opts.minBy { case (rt, i, _) => (rt, i) }
        if (bestRate <= cur + 1e-9) {
          if (best.depth == 0) done += ((best, bestRate))
          else next += ((best, bestRate))
        } else done += ((r, cur))
      }
      active = next.result()
    }

    // best-rule-first order; exact duplicates collapse
    val ordered = done.result().sortBy { case (r, rt) => (rt, r.encode) }
      .map(_._1).distinct
    val finalLeaves = dropSubsumed(ordered)
    // ONE more routing job records per-rule training distributions so
    // simplify → transformProba / C45Model.save compose. The
    // generalized rules overlap, so membership is FIRST-MATCH — the
    // same CASE WHEN rid expression transform scores such models with
    // (C45.flatRidColumn) — and masses are whole-row counts in exact
    // micros (C4.5rules classifies with unknown-fails semantics: a
    // null on a rule's attribute routes past it, so there is no
    // fractional membership to record). O(Σ depth) expression, one
    // partial-aggregated count, O(rules × classes) rows to the driver.
    val dist: Vector[Map[String, Long]] =
      if (finalLeaves.isEmpty) Vector.empty
      else {
        val rid = C45.flatRidColumn(finalLeaves, names)
        // null class labels (rejected by the fit, but this is public
        // API) carry no attributable class — dropped, like rid -1
        val byRid = df.select(rid.as("__rid"), cls.as("__cls"))
          .filter(col("__rid") >= 0 && col("__cls").isNotNull)
          .groupBy("__rid", "__cls").agg(count(lit(1)).as("__n"))
          .collect()
          .groupBy(_.getInt(0))
          .map { case (i, rows) =>
            i -> rows.map(r =>
              r.getString(1) -> r.getLong(2) * 1000000L).toMap
          }
        finalLeaves.indices.toVector.map(i => byRid.getOrElse(i, Map.empty))
      }
    model.copy(leaves = finalLeaves, leafMass = dist.map(_.values.sum),
      leafDist = dist)
  }

  /** Does satisfying `c1` guarantee satisfying `c2`? */
  private def implies(c1: graft.model.Split, c2: graft.model.Split): Boolean =
    (c1, c2) match {
      case (a, b) if a == b => true
      case (graft.model.NumLE(a), graft.model.NumLE(b)) => a <= b
      case (graft.model.NumGT(a), graft.model.NumGT(b)) => a >= b
      case _ => false
    }

  /** Are `c1` and `c2` mutually exclusive (no value satisfies both)? */
  private def excludes(c1: graft.model.Split, c2: graft.model.Split): Boolean =
    (c1, c2) match {
      case (graft.model.CatEq(a), graft.model.CatEq(b)) => a != b
      case (graft.model.NumLE(x), graft.model.NumGT(y)) => x <= y
      case (graft.model.NumGT(y), graft.model.NumLE(x)) => x <= y
      case _ => false
    }

  /** Provably-disjoint predicates: some attribute carries mutually
    * exclusive conditions in the two rules. (Sound, not complete —
    * rules not provably disjoint are treated as overlapping.) */
  private def disjoint(r1: Rule, r2: Rule): Boolean =
    r1.conditions.exists { case (a1, s1) =>
      r2.conditions.exists { case (a2, s2) => a1 == a2 && excludes(s1, s2) }
    }

  /** C4.5rules' redundancy cleanup, specialized to the cases that can
    * NEVER change a first-match prediction. A specific rule goes when a
    * same-label general rule subsumes it (every condition of the
    * general rule implied by one of the specific rule's) and either
    *  - the general rule ranks EARLIER — the specific rule is dead
    *    code (covers mutually-equivalent duplicates: earlier wins); or
    *  - the general rule ranks later but STRICTLY more general, and
    *    every different-label rule ranked between them is provably
    *    [[disjoint]] from the specific rule — rows the specific rule
    *    claimed then fall through only same-label rules until the
    *    general one catches them. Without that disjointness an
    *    intervening different-label rule would capture those rows and
    *    flip predictions, so such rules are kept.
    * Drops apply one at a time against the CURRENT survivor list (each
    * step is individually prediction-preserving, so the composition
    * is), iterated to a fixpoint. Driver-side O(R³ d²) worst case over
    * the model — tiny — and deterministic. */
  private[fit] def dropSubsumed(rules: Vector[Rule]): Vector[Rule] = {
    def subsumes(general: Rule, specific: Rule): Boolean =
      general.label == specific.label &&
        general.conditions.forall { case (ga, gs) =>
          specific.conditions.exists { case (sa, ss) =>
            sa == ga && implies(ss, gs)
          }
        }
    var kept = rules
    var changed = true
    while (changed) {
      changed = false
      var i = 0
      while (i < kept.length) {
        val s = kept(i)
        val droppable = kept.indices.exists { j =>
          j != i && subsumes(kept(j), s) && (
            j < i ||
              (!subsumes(s, kept(j)) &&
                (i + 1 until j).forall(k =>
                  kept(k).label == s.label || disjoint(kept(k), s))))
        }
        if (droppable) { kept = kept.patch(i, Nil, 1); changed = true }
        else i += 1
      }
    }
    kept
  }
}
