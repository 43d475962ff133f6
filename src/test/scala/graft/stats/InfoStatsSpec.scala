package graft.stats

import graft.{Fixtures, SparkTestSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class InfoStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val Eps = 1e-9

  test("class entropy of play-tennis root is 0.940286 (hand-computed)") {
    val counts = Fixtures.tennis(spark).groupBy("play").agg(count(lit(1)).as("cnt"))
    val h = InfoStats.entropyOfCounts(counts, Seq.empty)
      .collect()(0).getDouble(1)
    // H(9/14, 5/14) = -(9/14)log2(9/14) - (5/14)log2(5/14)
    assert(math.abs(h - 0.9402859586706309) < Eps)
  }

  test("categorical gain ratio of outlook matches the textbook value") {
    val cells = Fixtures.tennis(spark)
      .groupBy(col("outlook").as("val"), col("play").as("cls"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("gid", lit(0))
    val r = InfoStats.categoricalSplitStats(cells, Seq("gid")).collect()(0)
    val info = r.getDouble(2); val splitInfo = r.getDouble(3)
    val condE = r.getDouble(4); val gain = r.getDouble(5); val gr = r.getDouble(6)
    assert(math.abs(info - 0.9402859586706309) < Eps)
    // E(outlook) = 5/14*H(2/5,3/5) + 4/14*0 + 5/14*H(3/5,2/5) = 0.693536
    assert(math.abs(condE - 0.6935361388961918) < Eps)
    assert(math.abs(gain - 0.24674981977443933) < Eps)
    // SplitInfo(5,4,5 of 14) = 1.577406
    assert(math.abs(splitInfo - 1.5774062828523454) < Eps)
    assert(math.abs(gr - gain / splitInfo) < Eps)
  }

  test("entropy bounds: 0 <= H <= log2(k) on every contingency group") {
    val cells = Fixtures.tennis(spark)
      .groupBy(col("windy").as("val"), col("play").as("cls"))
      .agg(count(lit(1)).as("cnt"))
    val rows = InfoStats.entropyOfCounts(cells, Seq("val")).collect()
    rows.foreach { r =>
      val h = r.getDouble(2)
      assert(h >= -Eps && h <= math.log(2) / math.log(2) + Eps)
    }
  }

  test("splitInfo==0 ∧ impure ⇒ epsilon gain ratio (MyReducer.java:295)") {
    val s = spark
    import s.implicits._
    // one single-valued attribute over an impure class mix
    val cells = Seq((0, "only", "yes", 7L), (0, "only", "no", 7L))
      .toDF("gid", "val", "cls", "cnt")
    val r = InfoStats.categoricalSplitStats(cells, Seq("gid")).collect()(0)
    assert(math.abs(r.getDouble(3)) < 1e-12) // split_info (up to float noise)
    assert(r.getDouble(6) == InfoStats.Epsilon)
  }

  test("splitInfo==0 ∧ pure ⇒ gain ratio 0 (leaf signal)") {
    val s = spark
    import s.implicits._
    val cells = Seq((0, "only", "yes", 14L)).toDF("gid", "val", "cls", "cnt")
    val r = InfoStats.categoricalSplitStats(cells, Seq("gid")).collect()(0)
    assert(r.getDouble(6) == 0.0)
  }

  test("one-pass boundary scan finds the pure humidity split on sunny days") {
    val sunny = Fixtures.tennis(spark).filter(col("outlook") === "sunny")
      .select(col("humidity").as("val"), col("play").as("cls"))
    val scan = InfoStats.boundaryScan(sunny, Seq.empty, Seq("no", "yes"))
    val best = InfoStats.bestSplits(scan, Seq.empty).collect()(0)
    // humidity <= 70 splits sunny {70y,70y | 85n,90n,95n} perfectly
    assert(best.getAs[Double]("boundary") == 70.0)
    assert(best.getAs[Double]("cond_entropy") < 1e-12)
    assert(best.getAs[Long]("left_n") == 2 && best.getAs[Long]("right_n") == 3)
  }

  test("boundary scan skips the max value and applies the 10% guard") {
    val s = spark
    import s.implicits._
    // 10 rows, values 1..10: boundary 10 must be absent (no right side);
    // with ratio 0.1 every other boundary is a candidate
    val df = (1 to 10).map(i => (i.toDouble, if (i <= 5) "a" else "b"))
      .toDF("val", "cls")
    val bs = InfoStats.boundaryScan(df, Seq.empty, Seq("a", "b")).collect()
    assert(bs.map(_.getAs[Double]("boundary")).toSet == (1 to 9).map(_.toDouble).toSet)
    // ratio 0.3: only boundaries with both sides >= 3 rows survive
    val tight = InfoStats.boundaryScan(df, Seq.empty, Seq("a", "b"),
      minDataRatio = 0.3).collect()
    assert(tight.map(_.getAs[Double]("boundary")).toSet == (3 to 7).map(_.toDouble).toSet)
  }

  test("per-group boundaries stay independent — quirk #3 (the reference " +
    "shares one boundary across rules via the global attVal, Main.java:242-246)") {
    val s = spark
    import s.implicits._
    // two rule groups whose optimal boundaries differ; each must keep its own
    val df = Seq(
      (0, 1.0, "a"), (0, 1.0, "a"), (0, 2.0, "b"), (0, 2.0, "b"),
      (1, 5.0, "a"), (1, 5.0, "a"), (1, 6.0, "b"), (1, 6.0, "b"))
      .toDF("rid", "val", "cls")
    val best = InfoStats.bestSplits(
      InfoStats.boundaryScan(df, Seq("rid"), Seq("a", "b")), Seq("rid"))
      .collect().map(r => r.getInt(0) -> r.getAs[Double]("boundary")).toMap
    assert(best == Map(0 -> 1.0, 1 -> 5.0))
  }

  test("row-permutation invariance of the chosen split") {
    val base = Fixtures.tennis(spark)
      .select(col("humidity").as("val"), col("play").as("cls"))
    val shuffled = base.orderBy(rand(seed = 7))
    def best(df: org.apache.spark.sql.DataFrame) =
      InfoStats.bestSplits(
        InfoStats.boundaryScan(df, Seq.empty, Seq("no", "yes")), Seq.empty)
        .collect()(0).getAs[Double]("boundary")
    assert(best(base) == best(shuffled))
  }
}
