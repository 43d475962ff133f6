package graft.fit

import graft.SparkTestSession
import graft.meta.C45Schema
import graft.model.{NumGT, NumLE}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** maxBins quantile discretization of the numeric split search: bounded
  * candidate boundaries per attribute regardless of cardinality. */
class BinningSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // 2000 rows, x ~ U(0,100) with 2000 distinct values; class = x > 50
  // plus a little noise — a binned search must still find ~50
  private lazy val df = {
    val s = spark
    import s.implicits._
    val rnd = new Random(3)
    (1 to 2000).map { _ =>
      val x = rnd.nextDouble() * 100
      val cls = if ((x > 50) != (rnd.nextDouble() < 0.05)) "hi" else "lo"
      (x, cls)
    }.toDF("x", "cls")
  }
  private lazy val schema = C45Schema.fromDataFrame(df, "cls")

  test("binned fit (maxBins=8) still finds the signal boundary near 50") {
    val m = C45.fit(df, schema, C45Params(maxBins = 8, maxDepth = 1))
    val bounds = m.leaves.flatMap(_.conditions.collect {
      case (_, NumLE(b)) => b
      case (_, NumGT(b)) => b
    }).distinct
    assert(bounds.length == 1)
    assert(math.abs(bounds.head - 50) < 15, s"boundary ${bounds.head} far from 50")
    val acc = m.transform(df).filter(col("prediction") === col("cls")).count()
      .toDouble / 2000
    assert(acc >= 0.9, s"accuracy $acc")
  }

  test("binned boundaries come from the quantile edge set (at most maxBins-1)") {
    val m = C45.fit(df, schema, C45Params(maxBins = 8))
    val bounds = m.leaves.flatMap(_.conditions.collect {
      case (_, NumLE(b)) => b; case (_, NumGT(b)) => b
    }).distinct
    assert(bounds.nonEmpty && bounds.size <= 7)
    assert(bounds.forall(b => !b.isInfinite))
  }

  test("low-cardinality attributes are untouched by maxBins (tennis tree identical)") {
    val a = C45.fit(graft.Fixtures.tennis(spark), graft.Fixtures.tennisSchema,
      C45Params(maxBins = 8))
    val b = C45.fit(graft.Fixtures.tennis(spark), graft.Fixtures.tennisSchema,
      C45Params(maxBins = 0))
    assert(a.leaves == b.leaves)
  }

  test("every row still reaches exactly one leaf under binning") {
    val m = C45.fit(df, schema, C45Params(maxBins = 8))
    val nMatches = m.leaves
      .map(r => when(r.toPredicate(Seq("x")), 1).otherwise(0))
      .reduce(_ + _)
    assert(df.withColumn("m", nMatches).filter(col("m") =!= 1).count() == 0)
  }
}
