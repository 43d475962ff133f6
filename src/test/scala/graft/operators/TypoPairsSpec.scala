package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** FastSS edit-distance-1 join: completeness over all three edit kinds
  * (substitution, insertion, deletion), exactness of the verify
  * filter, and the plan property the deletion-neighborhood exists for
  * — a key-equality join, never a cartesian product. */
class TypoPairsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def pairsOf(toks: String*): Set[(String, String)] =
    Dedup.editDistanceOnePairs(toks.toDF("tok"), "tok")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet

  test("finds substitution, insertion, and deletion pairs — nothing else") {
    val got = pairsOf("color", "colour", "colr", "bolor", "zzzz")
    // color~colour insertion, color~colr deletion, color~bolor
    // substitution; colour~colr is distance 2, zzzz pairs with nothing
    assert(got == Set(("color", "colour"), ("bolor", "color"),
      ("color", "colr")))
  }

  test("brute-force equality on a larger crafted vocabulary") {
    val toks = Seq("grft", "graft", "craft", "graf", "garft", "spark",
      "spork", "sprk", "sparks", "park", "bark", "dark", "ark")
    val got = pairsOf(toks: _*)
    val brute = (for {
      a <- toks; b <- toks if a < b
      if levenshteinDist(a, b) <= 1
    } yield (a, b)).toSet
    assert(got == brute)
  }

  private def levenshteinDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("plans a key-equality join, not a cartesian product") {
    // parquet-backed input: LocalRelation would constant-fold the plan
    val toks = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .filter(length(col("tok")) >= 4).distinct()
    val plan = Dedup.editDistanceOnePairs(toks, "tok")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"edit-distance join must be key-equality:\n$plan")
  }
}
