package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BlocklistSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("filterOut is exactly left-anti, even with a saturated bloom") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "aaa"), (2L, "bbb"), (3L, "ccc"), (4L, "aaa"), // dup key
      (5L, null.asInstanceOf[String]), (6L, "ddd")
    ).toDF("id", "k")
    val block = Seq("aaa", "ccc", "zzz").toDF("bk")
    // expectedItems=1 saturates the filter -> near-every row is a
    // bloom positive; the anti-join must still make the result exact
    val got = Blocklist.filterOut(corpus, block, "k", "bk", expectedItems = 1)
      .select("id").as[Long].collect().sorted
    val want = corpus.join(block.withColumnRenamed("bk", "k"),
      Seq("k"), "left_anti").select("id").as[Long].collect().sorted
    assert(got.sameElements(want))
    // both "aaa" copies and "ccc" blocked; the null-key row passes
    assert(got.toSeq == Seq(2L, 5L, 6L))
  }

  test("empty blocklist passes the corpus through untouched") {
    val s = spark
    import s.implicits._
    val corpus = Seq((1L, "a"), (2L, null.asInstanceOf[String])).toDF("id", "k")
    val block = Seq.empty[String].toDF("bk")
    val got = Blocklist.filterOut(corpus, block, "k", "bk")
    assert(got.count() == 2)
  }

  test("plan: bloom probe reaches both branches, anti-join is hash-based") {
    // parquet-backed (a LocalRelation corpus would be constant-folded
    // through the probe at optimize time and prove nothing)
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val block = corpus.filter(col("lang") === "zh")
      .select(col("text").as("bk")).distinct()
    val out = Blocklist.filterOut(corpus, block, "text", "bk")
    val plan = out.queryExecution.executedPlan.toString
    // the native might_contain probe gates BOTH scan branches
    assert("might_contain".r.findAllIn(plan).size >= 2, plan.take(2000))
    // false-positive elimination is a hash anti-join, never nested-loop
    assert(plan.contains("LeftAnti"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(2000))
  }
}
