package graft.operators

import graft.SparkTestSession
import graft.functions.Hashing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Hll]] / [[HllAggregator]] — 256-register HyperLogLog: register
  * math (rho, harmonic sum, linear-counting branch), merge algebra,
  * driver-replay agreement, repartition determinism, and accuracy
  * envelopes on both estimator branches. */
class HllAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("rho matches the bitlen definition across the 52-bit range") {
    assert(Hll.rho(0L) == 53)
    assert(Hll.rho(1L) == 52)
    assert(Hll.rho(2L) == 51)
    assert(Hll.rho(3L) == 51)
    assert(Hll.rho((1L << 51) - 1) == 2)
    assert(Hll.rho(1L << 51) == 1)
    // 53 - bitlen(w), spelled independently
    for (w <- Seq(5L, 1023L, 4096L, 999999937L))
      assert(Hll.rho(w) == 53 - java.lang.Long.toBinaryString(w).length)
  }

  test("linear-counting table is floor(m ln(m/V) + 0.5); empty sketch -> 0") {
    assert(Hll.LinearCount(256) == 0L) // all buckets empty
    assert(Hll.LinearCount(1) ==
      math.floor(256.0 * math.log(256.0) + 0.5).toLong)
    // estimate of the empty sketch: S = 256 * 2^53, V = 256
    assert(Hll.estimate(256L * (1L << 53), 256) == 0L)
  }

  test("merge is an elementwise register max, commutative and idempotent") {
    val a = new HllAggregator
    val x = a.zero; x(0) = 5; x(10) = 3
    val y = a.zero; y(0) = 2; y(10) = 7; y(255) = 1
    val m = a.merge(x.clone(), y.clone())
    assert(m(0) == 5 && m(10) == 7 && m(255) == 1 && m(1) == 0)
    assert(a.merge(y.clone(), x.clone()).toSeq == m.toSeq)
    assert(a.merge(m.clone(), m.clone()).toSeq == m.toSeq)
  }

  test("aggregator agrees with a driver-side replay of the register math") {
    val s = spark
    import s.implicits._
    val vals = (1 to 5000).map(i => s"v${i % 1234}")
    val hashes = vals.toDF("v")
      .select(Hashing.hash60(col("v")).as("h"))
      .collect().map(_.getAs[Long]("h"))
    // driver replay
    val regs = new Array[Byte](Hll.M)
    hashes.foreach { h =>
      val b = (h % Hll.M).toInt
      val r = Hll.rho(h / Hll.M)
      if (r > regs(b)) regs(b) = r.toByte
    }
    val (sSum, v) = Hll.harmonics(regs)
    val want = HllSketch(Hll.M.toLong - v, Hll.estimate(sSum, v))
    val got = Sketches.hllPerGroup(
        vals.map(("k", _)).toDF("g", "v"), "g", "v")
      .collect().head
    assert(got.getAs[Long]("n_buckets_set") == want.nBucketsSet)
    assert(got.getAs[Long]("est_distinct") == want.estDistinct)
  }

  test("deterministic under repartitioning") {
    val s = spark
    import s.implicits._
    val df = (1 to 20000).map(i => (s"g${i % 3}", s"u${i % 4567}")).toDF("g", "v")
    def run(parts: Int) = Sketches.hllPerGroup(df.repartition(parts), "g", "v")
      .collect().map(r => (r.getAs[String]("key"),
        r.getAs[Long]("est_distinct"))).sortBy(_._1).toSeq
    assert(run(2) == run(13))
  }

  test("NULL values are ignored, matching count(DISTINCT v) semantics") {
    val s = spark
    import s.implicits._
    val withNulls = Seq(("g", Option("a")), ("g", None), ("g", Option("b")),
      ("g", None), ("g", Option("a"))).toDF("g", "v")
    val clean = Seq(("g", "a"), ("g", "b"), ("g", "a")).toDF("g", "v")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sketches.hllPerGroup(df, "g", "v").collect()
        .map(r => (r.getAs[Long]("n_buckets_set"),
          r.getAs[Long]("est_distinct"))).toSeq
    assert(run(withNulls) == run(clean))
    assert(run(clean).head._2 == 2L) // exact via linear counting
  }

  test("register tables: merged-across-batches estimate == single-shot UDAF") {
    // the mergeability contract q_hll_union asserts in-row: per-batch
    // register tables merged by elementwise max reproduce EXACTLY the
    // one-shot aggregator's registers, hence its estimate — two
    // independent code paths (relational Columns vs UDAF)
    val s = spark
    import s.implicits._
    val df = (1 to 9000).map(i => (i % 5, s"g${i % 2}", s"u${i % 1234}"))
      .toDF("batch", "g", "v")
    def report(res: org.apache.spark.sql.DataFrame) =
      res.collect().map(r => r.getAs[String]("key") ->
        ((r.getAs[Long]("n_buckets_set"),
          r.getAs[Long]("est_distinct")))).toMap
    val merged = report(
      Sketches.hllMergeEstimate(Sketches.hllRegisters(df, "batch", "g", "v")))
    val single = report(Sketches.hllPerGroup(df, "g", "v"))
    assert(merged == single)
    assert(merged.keySet == Set("g0", "g1"))
  }

  test("register tables: merging disjoint batch subsets == merging all") {
    val s = spark
    import s.implicits._
    val df = (1 to 6000).map(i => (i % 4, "k", s"u${i % 777}"))
      .toDF("batch", "g", "v")
    val regs = Sketches.hllRegisters(df, "batch", "g", "v")
    // merge(day 0-1) and merge(day 2-3) as INTERMEDIATE register
    // tables (batch relabeled), then merge those — associativity
    import org.apache.spark.sql.functions.{col, lit}
    val half1 = regs.filter(col("batch") < 2).withColumn("batch", lit(0))
      .groupBy("batch", "key", "bucket")
      .agg(org.apache.spark.sql.functions.max("r").as("r"))
    val half2 = regs.filter(col("batch") >= 2).withColumn("batch", lit(1))
      .groupBy("batch", "key", "bucket")
      .agg(org.apache.spark.sql.functions.max("r").as("r"))
    val viaHalves = Sketches.hllMergeEstimate(half1.unionAll(half2))
      .collect().map(r => r.getAs[Long]("est_distinct")).toSeq
    val direct = Sketches.hllMergeEstimate(regs)
      .collect().map(r => r.getAs[Long]("est_distinct")).toSeq
    assert(viaHalves == direct)
  }

  test("accuracy: linear-counting branch near-exact, raw branch within 10%") {
    val s = spark
    import s.implicits._
    // small cardinality (150) -> linear counting; large (20k) -> raw
    val df = ((1 to 3000).map(i => ("small", s"s${i % 150}")) ++
      (1 to 40000).map(i => ("large", s"l${i % 20000}"))).toDF("g", "v")
    val got = Sketches.hllPerGroup(df, "g", "v")
      .collect().map(r => r.getAs[String]("key") ->
        r.getAs[Long]("est_distinct")).toMap
    assert(math.abs(got("small") - 150L) <= 8L,
      s"linear counting at 150 distinct: ${got("small")}")
    assert(math.abs(got("large") - 20000L) <= 2000L,
      s"raw branch at 20k distinct: ${got("large")}")
  }
}
