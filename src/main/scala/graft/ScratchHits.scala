package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{CacheScope, GraphRank}
import graft.sources.Tables

// temporary profiling harness — not part of the library
object ScratchHits {
  val M = 1000000L

  // variant A: one localCheckpoint per FULL round (2 half-rounds fused),
  // broadcast-subquery max (exchange reuse dedupes raw)
  def hitsFused(edges: DataFrame, iters: Int, checkpointEvery: Int,
                scope: CacheScope = CacheScope.unmanaged()): DataFrame = {
    val e = scope.persist(edges
      .select(col("u"), col("v")).where(col("u") =!= col("v")).distinct())
    val ns = scope.persist(
      e.select(col("u").as("id")).union(e.select(col("v").as("id")))
        .distinct())
    var state = ns.select(col("id"), lit(M).as("hub"), lit(M).as("auth"))
      .localCheckpoint()
    def half(score: DataFrame, scoreCol: String, srcKey: String,
             dstKey: String, outCol: String): DataFrame = {
      val raw = e
        .join(score.select(col("id"), col(scoreCol)), e(srcKey) === score("id")).drop("id")
        .groupBy(col(dstKey).as("id"))
        .agg(sum(col(scoreCol)).as("raw"))
      val mx = raw.agg(max(col("raw")).as("mx"))
      ns.join(raw, Seq("id"), "left")
        .crossJoin(broadcast(mx))
        .select(col("id"),
          expr(s"(coalesce(raw, 0L) * ${M}L) div mx").as(outCol))
    }
    for (r <- 1 to iters) {
      val a2 = half(state.select(col("id"), col("hub")), "hub", "u", "v", "auth")
      val h2 = half(a2, "auth", "v", "u", "hub")
      val next0 = h2.join(a2, "id").select(col("id"), col("hub"), col("auth"))
      val next = if (r % checkpointEvery == 0 || r == iters)
        next0.localCheckpoint() else next0
      if (r % checkpointEvery == 0 || r == iters)
        org.apache.spark.sql.graft.CheckpointBridge.freeLocalCheckpoint(state)
      state = next
    }
    state.select(col("id"), col("hub").as("hub_micros"),
      col("auth").as("auth_micros"))
  }

  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"TIMER $label: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
    }
    def edges(): DataFrame = {
      val o = Tables.load(spark, dir, "orders")
        .filter(col("o_custkey") < 300L)
        .select(col("o_orderkey"), col("o_custkey"))
      val l = Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
      o.join(l, o("o_orderkey") === l("l_orderkey"))
        .select(col("o_custkey").cast("long").as("u"),
          (col("l_suppkey").cast("long") + lit(1000000L)).as("v"))
    }
    // warmup
    time("warmup_full")(GraphRank.hits(edges(), 5).count())
    spark.catalog.clearCache()
    time("current")(GraphRank.hits(edges(), 5).count())
    spark.catalog.clearCache()
    time("current2")(GraphRank.hits(edges(), 5).count())
    spark.catalog.clearCache()
    println("POST_SP: " + spark.conf.get("spark.sql.shuffle.partitions"))
    // parity check
    val a = GraphRank.hits(edges(), 5).orderBy("id").collect().toSeq
    val b = hitsFused(edges(), 5, 2).orderBy("id")
      .select(col("id"), col("hub_micros"), col("auth_micros")).collect().toSeq
    println(s"PARITY: ${a == b}")
    spark.stop()
  }
}
