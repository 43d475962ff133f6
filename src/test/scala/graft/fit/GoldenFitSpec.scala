package graft.fit

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Hard determinism check for the iterative fit (SURVEY.md O4): the
  * driver's correctness gate can only row-count `q_fit_tree` (no SQL
  * oracle exists for an iterative algorithm), so this spec pins the
  * EXACT sf0.01 rule set instead. The fit is deterministic — ties break
  * on (gainRatio, -aid) and (cond_entropy, boundary) — so any change in
  * tree shape is a real semantic change and must fail here. */
class GoldenFitSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("q_fit_tree reproduces the committed sf0.01 rule set exactly") {
    val golden = scala.io.Source.fromResource("golden/fit_sf001_rules.txt")
      .getLines().filter(_.nonEmpty).toVector
    val got = graft.queries.C45Queries.qFitTree(spark, "/root/testdata/sf0.01")
      .collect().map(_.getString(0)).toVector
    assert(got == golden,
      s"fitted rule set diverged from golden:\n got=${got.mkString("\n ")}")
  }
}
