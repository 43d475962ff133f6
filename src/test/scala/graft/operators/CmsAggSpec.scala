package graft.operators

import graft.SparkTestSession
import graft.functions.Hashing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The count-min UDAF ([[CmsAggregator]] via [[Sketches.cmsPerGroup]])
  * and its merge/estimate companions: the JVM hash must be the same
  * family as the Column hash, sharded-then-merged matrices must EQUAL
  * the single-shot relational cells (CMS merge is lossless, unlike the
  * HLL/KMV estimates), and point estimates must never under-count. */
class CmsAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("hash60Jvm ≡ the hash60 Column form across salts (one hash family)") {
    val s = spark
    import s.implicits._
    val vals = Seq("alpha", "beta", "γ-unicode", "", "with space", "42")
    val fromCols = (0 to 3).flatMap { salt =>
      vals.toDF("v")
        .select(col("v"), Hashing.hash60(col("v"), salt).as("h"))
        .collect().map(r => (salt, r.getString(0), r.getLong(1)))
    }
    fromCols.foreach { case (salt, v, h) =>
      assert(Hashing.hash60Jvm(v, salt) == h,
        s"hash60Jvm('$v', $salt) diverged from the Column form")
    }
  }

  test("sharded UDAF sketches merge LOSSLESSLY to the single-shot " +
    "relational cells, and estimates never under-count") {
    val s = spark
    import s.implicits._
    val width = 32
    val docs = (1 to 60).map(i =>
      (i.toLong, s"tok${i % 7} tok${i % 3} common")).toDF("doc_id", "text")
    // per-shard UDAF sketches → elementwise-sum merge
    val shards = Sketches.cmsPerGroup(
      docs.withColumn("shard", pmod(col("doc_id"), lit(3L))),
      "shard", "text", width)
    assert(shards.count() == 3)
    val merged = shards
      .agg(Sketches.cmsMerge(collect_list(col("cms"))).as("cms"))
      .head().getSeq[Long](0)
    // single-shot relational cells laid out into the same flat matrix
    val flat = new Array[Long](Sketches.CmsDepth * width)
    Sketches.cmsBuild(docs, "text", width).collect().foreach { r =>
      flat(r.getInt(0) * width + r.getLong(1).toInt) = r.getLong(2)
    }
    assert(merged.toVector == flat.toVector,
      "summed shard matrices must equal the single-shot cells exactly")
    // point estimates: est >= exact for every present token
    val exact = docs
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("t"))
      .groupBy("t").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = docs.sparkSession.createDataset(exact.keys.toSeq.sorted)
      .toDF("t")
      .crossJoin(broadcast(shards
        .agg(Sketches.cmsMerge(collect_list(col("cms"))).as("cms"))))
      .select(col("t"),
        Sketches.cmsPointEstimate(col("cms"), col("t"), width).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, n) =>
      assert(est(t) >= n, s"CMS under-counted '$t': ${est(t)} < $n")
    }
    assert(est("common") >= 60L)
  }
}
