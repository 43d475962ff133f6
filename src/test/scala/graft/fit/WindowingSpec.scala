package graft.fit

import graft.SparkTestSession
import graft.meta.{AttrMeta, C45Schema}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quinlan's windowing ([[C45Windowing]]): denom 1 must be the plain
  * one-shot fit in one pass; the grow-refit loop must converge on a
  * learnable corpus, be replay-deterministic, and the converged tree
  * must classify the FULL training set no worse than the one-shot
  * tree (the windowing contract: the loop only stops once nothing
  * outside the window is misclassified). */
class WindowingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val schema = C45Schema(
    Seq(AttrMeta("c1", isNumeric = false),
      AttrMeta("x1", isNumeric = true)),
    "cls", Seq("N", "P"))

  /** 600 rows, a learnable planted (c1, x1) interaction + 10%
    * deterministic noise (same construction as C45BoostSpec). */
  private def fixture = spark.range(600).select(
    col("id").cast("string").as("k"),
    (col("id") % 3).cast("string").as("c1"),
    (col("id") % 7).cast("double").as("x1"),
    when((col("id") % 3 === 0) === (col("id") % 7 <= 3),
      when(col("id") % 10 === 0, "N").otherwise("P"))
      .otherwise(when(col("id") % 10 === 0, "P").otherwise("N")).as("cls"))

  private def trainErrors(m: C45Model): Long =
    m.transform(fixture, "p")
      .filter(col("p") =!= col("cls")).count()

  test("initialDenom 1 trains on everything: one pass, converged, " +
    "bit-identical to the one-shot fit") {
    val w = C45Windowing.fit(fixture, schema, col("k"),
      C45WindowParams(initialDenom = 1, maxPasses = 3,
        base = C45Params(maxDepth = 2)))
    val plain = C45.fit(fixture, schema, C45Params(maxDepth = 2))
    assert(w.passes == 1 && w.converged)
    assert(w.windowRows == Vector(600L) && w.addedRows == Vector(0L))
    assert(w.model.ruleStrings == plain.ruleStrings)
    assert(w.model.majority == plain.majority)
  }

  test("the grow-refit loop converges, grows monotonically, replays " +
    "bit-identically, and the converged tree classifies the full " +
    "training set no worse than the one-shot tree") {
    val params = C45WindowParams(initialDenom = 3, maxPasses = 6,
      base = C45Params(maxDepth = 3))
    val w = C45Windowing.fit(fixture, schema, col("k"), params)
    assert(w.converged, s"did not converge in ${w.passes} passes")
    assert(w.addedRows.last == 0L)
    // every non-final pass added its mistakes, so windows grow
    assert(w.windowRows.zip(w.windowRows.tail).forall { case (a, b) => b >= a })
    assert(w.windowRows.head < 600L, "initial window must be a strict subset")
    // replay determinism: the window is a pure function of (row, models)
    val w2 = C45Windowing.fit(fixture, schema, col("k"), params)
    assert(w2.model.ruleStrings == w.model.ruleStrings)
    assert(w2.passes == w.passes && w2.windowRows == w.windowRows)
    // the windowing contract vs one-shot training accuracy
    val oneShot = C45.fit(fixture, schema, C45Params(maxDepth = 3))
    assert(trainErrors(w.model) <= trainErrors(oneShot),
      "window-converged tree must classify the training set no worse " +
        "than the one-shot tree")
  }

  test("maxPasses bounds the loop on an unlearnable corpus (pure noise " +
    "never converges from a strict subset)") {
    // cls is a hash-ish parity the two attributes cannot express, so
    // some outside-window rows stay misclassified every pass
    val noise = spark.range(600).select(
      col("id").cast("string").as("k"),
      (col("id") % 3).cast("string").as("c1"),
      (col("id") % 7).cast("double").as("x1"),
      when(col("id") % 2 === 0, "P").otherwise("N").as("cls"))
    val w = C45Windowing.fit(noise, schema, col("k"),
      C45WindowParams(initialDenom = 4, maxPasses = 2,
        base = C45Params(maxDepth = 1)))
    assert(w.passes == 2 && !w.converged)
    assert(w.windowRows.size == 2 && w.addedRows.size == 2)
  }
}
