package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Plan pins for the scan discipline the 100 TB design depends on:
  * rule predicates must reach the parquet reader as PushedFilters
  * (row groups whose zone maps exclude the predicate are never read),
  * and the read schema must carry ONLY the projected columns (a
  * 16-column lineitem scan for a 5-column query would read 3× the
  * bytes at any scale). Pinned on the REAL q_filter query so a future
  * Rule.toPredicate change that breaks translatability (e.g. wrapping
  * the column in a non-pushable expression) fails here, not in a
  * 100 TB profile. */
class ScanPushdownSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def formattedPlan(df: org.apache.spark.sql.DataFrame): String = {
    val qe = df.queryExecution
    org.apache.spark.sql.execution.ExplainMode
      .fromString("formatted") match { case m =>
      qe.explainString(m)
    }
  }

  test("q_filter: rule predicate reaches the parquet scan as PushedFilters") {
    val plan = formattedPlan(C45Queries.qFilter(spark, sf))
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("l_returnflag"), s"returnflag not pushed:\n$pushed")
    assert(pushed.contains("l_quantity"), s"quantity not pushed:\n$pushed")
    assert(pushed.contains("l_discount"), s"discount not pushed:\n$pushed")
    // all three rule conjuncts translate: equality, <=, >
    assert(pushed.contains("EqualTo") || pushed.contains("IsNotNull"),
      s"no pushdown at all:\n$pushed")
  }

  test("q_filter: read schema is pruned to the projected+filtered columns") {
    val plan = formattedPlan(C45Queries.qFilter(spark, sf))
    val read = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(read.nonEmpty, s"no ReadSchema line:\n$plan")
    // 5 projected columns and nothing else — notably NOT the wide
    // money/date/comment columns lineitem carries
    Seq("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
      "l_discount").foreach(c => assert(read.contains(c), s"$c missing:\n$read"))
    Seq("l_extendedprice", "l_shipdate", "l_comment").foreach(c =>
      assert(!read.contains(c), s"$c should be pruned:\n$read"))
  }

  test("documents text-quality scan prunes to the text column family") {
    val plan = formattedPlan(ExtQueries.qTextStats(spark, sf))
    val read = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(read.contains("text"), s"text missing:\n$read")
    assert(!read.contains("lang") && !read.contains("source"),
      s"unused document columns should be pruned:\n$read")
  }
}
