package graft.fit

import graft.SparkTestSession
import graft.meta.C45Schema
import org.scalatest.funsuite.AnyFunSuite

/** The deep-frontier routing path (broadcast rule-table join) must be
  * observationally identical to the flat CASE WHEN path: same rule
  * sets, level by level, on a tree wide enough to actually cross the
  * threshold — including both numeric and categorical splits and rows
  * with null attribute values (which must drop out of routing the same
  * way in both modes). */
class DeepFrontierSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Synthetic deep/wide corpus: root splits on the 8-value categorical
    * `a`, every child then splits numeric `x` (class flips at a
    * per-a-value boundary), so the frontier is 1 → 8 → 16. Several
    * copies per cell keep every branch above the minDataRatio guard. */
  private def wideData = {
    val s = spark
    import s.implicits._
    val rows = for {
      av <- 0 until 8
      x <- 0 until 10
      copy <- 0 until 3
    } yield {
      val cls = if (x <= (2 + av % 4)) "p" else "n"
      (s"v$av", x.toDouble, cls, copy)
    }
    rows.toDF("a", "x", "cls", "copy").drop("copy")
  }

  private def leafSet(m: C45Model) = m.leaves.map(_.encode).toSet

  test("join-routed fit produces exactly the CASE WHEN fit's rule set") {
    val df = wideData
    val schema = C45Schema.fromDataFrame(df, "cls")
    val flat = C45.fit(df, schema, C45Params(routeJoinThreshold = 10000))
    val joined = C45.fit(df, schema, C45Params(routeJoinThreshold = 2))
    assert(leafSet(joined) == leafSet(flat))
    assert(joined.majority == flat.majority)
    assert(flat.leaves.size >= 16, "the tree must actually grow wide")
  }

  test("join-routed fit handles null attribute values like the flat path") {
    val s = spark
    import s.implicits._
    val base = wideData
    val withNulls = base.union(
      Seq((null.asInstanceOf[String], 3.0, "p"), ("v0", 3.0, "p"))
        .toDF("a", "x", "cls"))
    val schema = C45Schema.fromDataFrame(base, "cls")
    val flat = C45.fit(withNulls, schema, C45Params(routeJoinThreshold = 10000))
    val joined = C45.fit(withNulls, schema, C45Params(routeJoinThreshold = 2))
    assert(leafSet(joined) == leafSet(flat))
  }

  test("join-routed fit works on a categorical-only schema") {
    // regression: with no numeric attributes the num route branch used
    // to be built anyway over a NullType map (element_at(lit(null), …))
    // — it worked via an implicit cast but was one analyzer change away
    // from breaking; the branch is now constructed only when numeric
    // attributes exist. This fit must cross the join threshold with a
    // purely categorical frontier.
    val s = spark
    import s.implicits._
    val rows = for {
      av <- 0 until 8
      bv <- 0 until 4
      copy <- 0 until 3
    } yield {
      // hierarchical labels: each attribute is informative on its own
      // (XOR-style labels would have zero marginal gain and no tree)
      val cls = (if (bv < 2) "p" else "x") + (if (av < 4) "0" else "1")
      (s"a$av", s"b$bv", cls)
    }
    val df = rows.toDF("a", "b", "cls")
    val schema = C45Schema.fromDataFrame(df, "cls")
    val flat = C45.fit(df, schema, C45Params(routeJoinThreshold = 10000))
    val joined = C45.fit(df, schema, C45Params(routeJoinThreshold = 2))
    assert(leafSet(joined) == leafSet(flat))
    assert(flat.leaves.size >= 8, "the tree must actually grow wide")
  }

  test("join-routed fit works on a numeric-only schema") {
    val s = spark
    import s.implicits._
    val rows = for {
      x <- 0 until 8
      y <- 0 until 8
      copy <- 0 until 3
    } yield {
      val cls = (if (x <= 3) "l" else "r") + (if (y <= 3) "d" else "u")
      (x.toDouble, y.toDouble, cls)
    }
    val df = rows.toDF("x", "y", "cls")
    val schema = C45Schema.fromDataFrame(df, "cls")
    val flat = C45.fit(df, schema, C45Params(routeJoinThreshold = 10000))
    val joined = C45.fit(df, schema, C45Params(routeJoinThreshold = 2))
    assert(leafSet(joined) == leafSet(flat))
  }

  test("join-routed fit reproduces a PREDICTED 160-leaf tree exactly") {
    // A several-hundred-leaf stress with an absolute pin: the label is
    // engineered so the whole tree is derivable by hand, and the spec
    // constructs the EXPECTED rule set from first principles instead
    // of a committed golden. Design (margins are exact rationals at
    // perfectly balanced counts, never float-noise ties):
    //  - cls embeds `a` verbatim -> a's 16-way split scores gain ratio
    //    exactly 1.0 at the root;
    //  - cls embeds only floor(b/2) -> b scores exactly 2/3 (gain 2
    //    bits / splitInfo 3 bits) — a REAL root margin, and b wins
    //    level 1 inside each a-child;
    //  - the x band exists only under b in {0,1} -> x scores 1.0 there
    //    and ~0.25 above.
    // Frontier 1 -> 16 -> 128 -> 64 with routeJoinThreshold=4: every
    // level past the root takes the broadcast rule-table join, with
    // 16- and 8-entry categorical child maps and a numeric boundary
    // route — widths the lineitem fits never reach.
    val s = spark
    import s.implicits._
    val rows = for {
      a <- 0 until 16
      b <- 0 until 8
      x <- 0 until 4
      copy <- 0 until 3
    } yield {
      val cls =
        if (b >= 2) s"c$a:${b / 2}"
        else s"c$a:0:${if (x <= 1) "x0" else "x1"}"
      (s"a$a", s"b$b", x.toDouble, cls, copy)
    }
    val df = rows.toDF("a", "b", "x", "cls", "copy").drop("copy")
    val schema = C45Schema.fromDataFrame(df, "cls")
    val m = C45.fit(df, schema, C45Params(routeJoinThreshold = 4))
    val expected = (for {
      a <- 0 until 16
      b <- 0 until 8
    } yield {
      if (b >= 2) Seq(s"0,a$a&1,b$b:c$a:${b / 2}")
      else Seq(s"0,a$a&1,b$b&2,<=1.0:c$a:0:x0",
        s"0,a$a&1,b$b&2,>1.0:c$a:0:x1")
    }).flatten.toSet
    assert(m.leaves.size == 160)
    assert(leafSet(m) == expected)
  }

  test("every join-routed level plans a broadcast join and no shuffle") {
    // The routing claim itself, pinned at the plan level: each routed
    // level is prevBase ⋈ broadcast(routeDf) — a BroadcastHashJoin
    // with NO hash-partitioning exchange and no sort-merge join. A
    // regression that loses the broadcast hint (or grows the route
    // table past a hint-less planner's threshold) would silently turn
    // every tree level into a full shuffle of the training data.
    // One benign degenerate is allowed: when the PREVIOUS frontier was
    // the single root, __rid constant-folds to a literal, the equi
    // condition folds away, and the one-row route table joins as a
    // BroadcastNestedLoopJoin — per-row work identical to inlining
    // that single route as an expression. With >1 route the equi key
    // is real and the plan must be a BroadcastHashJoin.
    val df = wideData
    val schema = C45Schema.fromDataFrame(df, "cls")
    sys.props("graft.fit.capturePlans") = "1"
    try {
      C45.capturedRoutePlans.clear()
      C45.fit(df, schema, C45Params(routeJoinThreshold = 1))
      val plans = C45.capturedRoutePlans.toList
      assert(plans.size >= 2, s"expected >=2 join-routed levels, got ${plans.size}")
      assert(plans.exists(_.startsWith("routes=") &&
        !plans.forall(_.startsWith("routes=1\n"))),
        "at least one level must carry a multi-route table")
      plans.foreach { p =>
        if (!p.startsWith("routes=1\n"))
          assert(p.contains("BroadcastHashJoin"), s"routing must broadcast-hash-join:\n$p")
        assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
          !p.contains("Exchange hashpartitioning"),
          s"routing must not shuffle:\n$p")
      }
    } finally {
      sys.props.remove("graft.fit.capturePlans")
      C45.capturedRoutePlans.clear()
    }
  }

  test("join-routed fit leaves no cached blocks behind") {
    val df = wideData
    val schema = C45Schema.fromDataFrame(df, "cls")
    val before = spark.sparkContext.getPersistentRDDs.size
    C45.fit(df, schema, C45Params(routeJoinThreshold = 2))
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after <= before, s"persisted RDDs leaked: $before -> $after")
  }
}
