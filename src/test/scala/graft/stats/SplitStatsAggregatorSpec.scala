package graft.stats

import graft.{Fixtures, SparkTestSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SplitStatsAggregatorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val Eps = 1e-12

  test("single-pass Aggregator agrees with the declarative formulation per group") {
    val s = spark
    import s.implicits._
    // one group per attribute, typed pairs (attrName, (value, class))
    val pairs = Fixtures.tennis(spark)
      .select(col("outlook"), col("windy"), col("play")).as[(String, String, String)]
      .flatMap { case (o, w, p) => Seq(("outlook", o, p), ("windy", w, p)) }
    val typed = pairs.groupByKey(_._1)
      .mapValues { case (_, v, c) => (v, c) }
      .agg(new SplitStatsAggregator().toColumn.name("st"))
      .collect().toMap

    val cells = Fixtures.tennis(spark)
      .select(col("play").as("cls"),
        explode(map(lit("outlook"), col("outlook"),
          lit("windy"), col("windy"))).as(Seq("attr", "val")))
      .groupBy("attr", "val", "cls").agg(count(lit(1)).as("cnt"))
    val declarative = InfoStats.categoricalSplitStats(cells, Seq("attr"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Double]("info"), r.getAs[Double]("split_info"),
          r.getAs[Double]("cond_entropy"), r.getAs[Double]("gain"),
          r.getAs[Double]("gain_ratio"))).toMap

    Seq("outlook", "windy").foreach { a =>
      val t = typed(a); val d = declarative(a)
      assert(t.n == d._1)
      assert(math.abs(t.info - d._2) < Eps)
      assert(math.abs(t.splitInfo - d._3) < Eps)
      assert(math.abs(t.condEntropy - d._4) < Eps)
      assert(math.abs(t.gain - d._5) < Eps)
      assert(math.abs(t.gainRatio - d._6) < Eps)
    }
  }
}
