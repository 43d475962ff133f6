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
    // a small thread pool overlaps independent queries' jobs (Spark's
    // FIFO scheduler back-fills executors from the next query while
    // one query waits on its tail — guide §2.6); every query is
    // independent and partitioning-independent, and streaming sink
    // names are atomic-counter-unique, so concurrency cannot change
    // any result. 3 threads ≈ cuts this smoke pass from ~5 min to ~2
    // on local[4] — the single largest line item in the suite's wall
    // (the driver's test leg has a hard budget; r21's timed out).
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val futures = SparkEntry.queries.toSeq.map { case (name, fn) =>
        scala.concurrent.Future {
          val n = fn(spark, "/root/testdata/sf0.001").count()
          assert(n > 0, s"$name returned no rows")
        }
      }
      import scala.concurrent.duration._
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures), 20.minutes)
    } finally pool.shutdown()
  }
}
