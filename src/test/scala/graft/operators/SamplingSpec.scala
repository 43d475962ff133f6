package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ids(n: Int) = {
    val s = spark
    import s.implicits._
    (1 to n).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "stratum")
  }

  test("bernoulli sample is reproducible and near the target rate") {
    val df = ids(2000)
    val a = Sampling.bernoulli(df, "id", 100).collect().map(_.getLong(0)).toSet
    val b = Sampling.bernoulli(df, "id", 100).collect().map(_.getLong(0)).toSet
    assert(a == b, "deterministic")
    assert(math.abs(a.size - 200) < 60, s"got ${a.size}, expected ~200")
    // rate monotonicity: a 10% sample is a subset of a 20% sample
    val wider = Sampling.bernoulli(df, "id", 200).collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(wider))
  }

  test("null ids are hashed (as empty string), not silently dropped") {
    val s = spark
    import s.implicits._
    val df = Seq(Some(1L), Some(2L), None).map(Tuple1(_)).toDF("id")
    // hash60('0|') % 1000 decides the null row like any other; with
    // permille=1000 EVERY row — including the null id — must survive
    // (pre-fix, Spark's concat(NULL) → NULL filter dropped it while
    // the DuckDB oracle kept deciding — a silent cross-engine skew)
    assert(Sampling.bernoulli(df, "id", 1000).count() == 3)
    // and fixedPerStratum ranks the null id instead of NaN-ordering it
    val strat = Seq((Some(1L), "a"), (None, "a"), (Some(3L), "a"))
      .toDF("id", "stratum")
    assert(Sampling.fixedPerStratum(strat, "stratum", "id", 3).count() == 3)
  }

  test("stratified sample applies the per-stratum rate") {
    val df = ids(2000)
    val got = Sampling.stratified(df, "stratum", "id",
        Map("a" -> 500), defaultPermille = 50)
      .groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(got("a") - 500) < 80, s"stratum a: ${got("a")} vs ~500")
    assert(math.abs(got.getOrElse("b", 0L) - 50) < 40, s"stratum b: ${got.getOrElse("b", 0L)} vs ~50")
  }

  test("mixture sample hits target shares in expectation; caps scarce strata; " +
    "excludes unlisted strata") {
    val s = spark
    import s.implicits._
    // three sources, 1000 docs of weight 10 each (W = 10000 per source)
    val df = (1 to 3000).map(i =>
      (i.toLong, s"src${(i - 1) / 1000}", 10L)).toDF("id", "source", "w")
    // budget 25000: src0 target 15000 > W -> keep all (cap); src1
    // target 5000 of 10000 -> ppm 500000 (~half); src2 unlisted -> out
    val got = Sampling.mixtureSample(df, "source", "id", "w",
      Map("src0" -> 600, "src1" -> 200), budget = 25000L)
    val bySrc = got.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") == 1000, "capped stratum keeps every row")
    assert(bySrc("src1") > 350 && bySrc("src1") < 650,
      s"~half expected at ppm 500000, got ${bySrc("src1")}")
    assert(!bySrc.contains("src2"), "a mixture is a whitelist")
    // reproducible: same call, same rows
    val again = Sampling.mixtureSample(df, "source", "id", "w",
      Map("src0" -> 600, "src1" -> 200), budget = 25000L)
    assert(got.select("id").collect().map(_.getLong(0)).toSet ==
      again.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("mixture sample: trillion-scale target weights don't wrap; oversubscription rejected") {
    val s = spark
    import s.implicits._
    // W = 100 × 1e12 = 1e14; budget 2e13 at share 1000‰ → target weight
    // T = 2e13 (> the ~9.2e12 int64 wrap point of the old T·10^6
    // product) and T < W → fractional rate ppm = 200000 (20%). The
    // wrapped arithmetic produced a NEGATIVE ppm and kept nothing.
    val df = (1 to 100).map(i => (i.toLong, "src0", 1000000000000L))
      .toDF("id", "source", "w")
    val kept = Sampling.mixtureSample(df, "source", "id", "w",
      Map("src0" -> 1000), budget = 20000000000000L).count()
    assert(kept > 5 && kept < 40, s"~20 of 100 expected at ppm 200000, got $kept")
    // a >1000‰ mixture silently over-targets the budget — reject loudly
    intercept[IllegalArgumentException] {
      Sampling.mixtureSample(df, "source", "id", "w",
        Map("a" -> 600, "b" -> 600), budget = 100L)
    }
  }

  test("fixed-size sample returns exactly n per stratum, stable under shuffling") {
    val df = ids(500)
    val got = Sampling.fixedPerStratum(df, "stratum", "id", 25)
    val counts = got.groupBy("stratum").count().collect().map(_.getLong(1))
    assert(counts.toSeq == Seq(25L, 25L))
    val again = Sampling.fixedPerStratum(df.repartition(13), "stratum", "id", 25)
      .collect().map(_.getLong(0)).toSet
    assert(again == got.collect().map(_.getLong(0)).toSet)
  }

  test("KMV estimate is close to the true distinct count and exact below k") {
    val s = spark
    import s.implicits._
    val df = (1 to 10000).map(i => i % 700).toDF("v")
    val row = Sampling.kmvDistinct(df, "v", 64).collect()(0)
    val est = row.getAs[Double]("est_distinct")
    assert(math.abs(est - 700) / 700 < 0.3, s"est $est vs 700")
    // fewer distincts than k → exact
    val small = (1 to 100).map(i => i % 10).toDF("v")
    val exact = Sampling.kmvDistinct(small, "v", 64).collect()(0)
    assert(exact.getAs[Long]("k_actual") == 10L)
    assert(exact.getAs[Double]("est_distinct") == 10.0)
  }

  test("tfIdf: rare terms outscore ubiquitous ones") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "common rare common"), (2L, "common common"),
      (3L, "common other")).toDF("doc_id", "text")
    val got = TextAnalysis.tfIdf(df, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val (tfRare, dfRare, scoreRare) = got((1L, "rare"))
    val (tfCommon, dfCommon, scoreCommon) = got((1L, "common"))
    assert(tfRare == 1 && dfRare == 1)
    assert(tfCommon == 2 && dfCommon == 3)
    // df==N → idf == 1 exactly (smoothed); tf=2 → score 2.0
    assert(math.abs(scoreCommon - 2.0) < 1e-12)
    assert(scoreRare > 1.0 && scoreRare < scoreCommon,
      "tf dominates here (tf=2 vs 1) but rare idf > 1")
  }

  test("weightedSample: k per stratum, heavy weights dominate, zero weights excluded") {
    val s = spark
    import s.implicits._
    val d = ((1 to 50).map(i => (i.toLong, "x", 1.0)) ++
      Seq((100L, "x", 1e9), (200L, "x", 0.0)) ++
      (1 to 3).map(i => (300L + i, "y", 1.0)))
      .toDF("id", "stratum", "w")
    val got = Sampling.weightedSample(d, "stratum", "id", "w", k = 5)
      .collect()
    val x = got.filter(_.getAs[String]("stratum") == "x")
    val y = got.filter(_.getAs[String]("stratum") == "y")
    assert(x.length == 5 && y.length == 3, "k per stratum, capped by size")
    assert(x.map(_.getAs[Int]("rank")).sorted.toSeq == Seq(1, 2, 3, 4, 5))
    // weight 1e9 vs 1: score ln(u)/1e9 ~ 0 > any unit-weight score
    assert(x.head.getAs[Long]("id") == 100L,
      "the overwhelming weight must rank first")
    assert(!got.exists(_.getAs[Long]("id") == 200L), "zero weight never sampled")
  }

  test("weightedSample equals the row_number formulation (window dual)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Sampling.weightedSample(docs, "lang", "doc_id", "n_chars", k = 5)
      .collect()
      .map(r => (r.getAs[String]("stratum"), r.getAs[Int]("rank").toLong,
        r.getAs[Long]("id"), r.getAs[Double]("score"))).sortBy(t => (t._1, t._2))
      .toSeq
    val u = (graft.functions.Hashing.hash60(col("doc_id").cast("string"), 13) +
      lit(0.5)) / lit(1152921504606846976.0)
    val score = floor(log(u) / col("n_chars") * lit(1e9) + lit(0.5)) / lit(1e9)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("__s").desc, col("doc_id").asc)
    val dual = docs.filter(col("n_chars") > 0)
      .withColumn("__s", score)
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= 5)
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Int]("__r").toLong,
        r.getAs[Long]("doc_id"), r.getAs[Double]("__s"))).sortBy(t => (t._1, t._2))
      .toSeq
    assert(got == dual)
  }
}
