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

  test("join-routed fit leaves no cached blocks behind") {
    val df = wideData
    val schema = C45Schema.fromDataFrame(df, "cls")
    val before = spark.sparkContext.getPersistentRDDs.size
    C45.fit(df, schema, C45Params(routeJoinThreshold = 2))
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after <= before, s"persisted RDDs leaked: $before -> $after")
  }
}
