package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Sharding.rendezvousShard]] — highest-random-weight routing: the
  * stability property (only the removed shard's keys move), range and
  * balance sanity, determinism, and the degenerate single shard. */
class ShardingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val keys = (1L to 2000L).toDF("k")

  test("HRW property: removing a shard moves ONLY its own keys") {
    val n = 8
    val assigned = keys.select(col("k"),
      Sharding.rendezvousShard(col("k"), n, salt = 5).as("b"),
      Sharding.rendezvousShard(col("k"), n - 1, salt = 5).as("a"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every key NOT on the removed shard keeps its assignment
    assert(assigned.forall { case (_, b, a) => b == n - 1 || a == b })
    // every key ON the removed shard moved somewhere in range
    assert(assigned.filter(_._2 == n - 1)
      .forall { case (_, _, a) => a >= 0 && a < n - 1 })
    assert(assigned.count(_._2 == n - 1) > 0)
  }

  test("shards are in range and roughly balanced") {
    val counts = keys
      .select(Sharding.rendezvousShard(col("k"), 8).as("s"))
      .groupBy("s").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.keySet === (0L to 7L).toSet)
    // 2000 keys over 8 shards: expect ~250 each; allow wide slack
    assert(counts.values.forall(c => c > 125 && c < 375), counts.toString)
  }

  test("deterministic across partitionings; salt changes the map") {
    def run(parts: Int, salt: Int) = keys.repartition(parts)
      .select(col("k"), Sharding.rendezvousShard(col("k"), 8, salt).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(2, 5) === run(7, 5))
    assert(run(2, 5) !== run(2, 6))
  }

  test("single shard is the constant 0; guard rejects zero") {
    val one = keys.select(Sharding.rendezvousShard(col("k"), 1).as("s"))
      .distinct().collect().map(_.getLong(0)).toSeq
    assert(one === Seq(0L))
    intercept[IllegalArgumentException] {
      Sharding.rendezvousShard(col("k"), 0)
    }
  }
}
