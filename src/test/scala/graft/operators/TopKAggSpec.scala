package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bounded top-k aggregate that replaced the per-qid row_number
  * windows in the ANN rankers: correctness of the k-bounded buffer, and
  * the plan property the replacement exists for — partial aggregation
  * BEFORE the exchange, no Window serializing one query's candidates
  * into a single partition. */
class TopKAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("aggregator buffer: bounded, ordered, merge == reduce-all") {
    val agg = new TopKAggregator(3)
    val xs = Seq(Scored(0.5, 7), Scored(0.9, 2), Scored(0.5, 3),
      Scored(0.1, 9), Scored(0.9, 1), Scored(0.7, 4))
    val all = xs.foldLeft(agg.zero)(agg.reduce)
    assert(all == List(Scored(0.9, 1), Scored(0.9, 2), Scored(0.7, 4)))
    // associativity under arbitrary splits
    for (cut <- 0 to xs.size) {
      val (a, b) = xs.splitAt(cut)
      val merged = agg.merge(a.foldLeft(agg.zero)(agg.reduce),
        b.foldLeft(agg.zero)(agg.reduce))
      assert(merged == all, s"split at $cut")
    }
    assert(agg.reduce(all, Scored(0.05, 0)) == all) // below the floor: no-op
  }

  test("brute-force top-k plans a partial aggregate and no Window") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = e.filter(col("vec_id") < 3)
    val top = Similarity.bruteForceTopK(e, "vec_id", "embedding",
      q, "vec_id", "embedding", 10)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_"), s"map-side partial combine missing:\n$plan")
    assert(!plan.contains("Window"), s"row_number window crept back:\n$plan")
  }

  test("IVF and PQ rankers carry no Window either") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = e.filter(col("vec_id") < 2)
    val ivf = Similarity.ivfTopK(e, "vec_id", "embedding",
      q, "vec_id", "embedding", 5, nCentroids = 4, nProbe = 4)
    // the probe-SELECTION window (|q| x nCentroids rows, broadcast side)
    // is fine; the corpus-side ranking must not be a window. Probe
    // selection sits before the broadcast, so the executed plan of the
    // final ranking stage must aggregate, not window, the scored rows.
    val plan = ivf.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    val pq = Similarity.pqTopK(e, "vec_id", "embedding",
      q, "vec_id", "embedding", 5, nSub = 4, nCodes = 4, rerank = 8)
    val pqPlan = pq.queryExecution.executedPlan.toString
    assert(pqPlan.contains("ObjectHashAggregate"), pqPlan)
    assert(!pqPlan.contains("Window"), s"row_number window crept back:\n$pqPlan")
  }
}
