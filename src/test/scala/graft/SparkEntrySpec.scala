package graft

import org.scalatest.funsuite.AnyFunSuite

class SparkEntrySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("entry (flagship root gain-ratio ranking) returns a ranked row per attribute") {
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.length == 6) // 2 categorical + 4 numeric attrs
    val grs = rows.map(_.getAs[Double]("gain_ratio"))
    assert(grs.sameElements(grs.sortBy(-_))) // ranked descending
  }

  test("every oracle key has a query implementation") {
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(SparkEntry.queries.contains(k), s"oracle without query: $k")
    }
  }

  test("README's stated query count matches the registry (keeps docs honest)") {
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    val n = SparkEntry.queries.size
    assert(readme.contains(s"$n named queries"),
      s"README.md must say '$n named queries' (registry has $n; " +
        "update the graft/queries bullet)")
    assert(SparkEntry.oracleSql.size == n,
      s"every query needs an oracle: ${n} queries vs " +
        s"${SparkEntry.oracleSql.size} oracles")
  }

  test("SURVEY §8's stated query total matches the registry (keeps docs honest)") {
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val n = SparkEntry.queries.size
    assert(survey.contains(s"for **$n total**"),
      s"SURVEY.md §8 must say 'for **$n total**' (registry has $n; " +
        "update the query enumeration paragraph)")
  }

  test("all queries run at sf0.001 and return rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(n > 0, s"$name returned no rows")
    }
  }
}
