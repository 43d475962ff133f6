package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClusterProfileSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("cluster profile partitions the corpus: members sum to n, cohesion in [-1,1]") {
    val n = emb.count()
    val rows = Similarity.clusterProfile(emb, "vec_id", "embedding", 4)
      .collect()
    assert(rows.map(_.getAs[Long]("n_members")).sum == n)
    assert(rows.map(_.getAs[Long]("cid")).distinct.length == rows.length)
    rows.foreach { r =>
      val m = r.getAs[Double]("mean_sim")
      assert(m >= -1.0 && m <= 1.0, s"cohesion out of range: $m")
    }
  }

  test("profile counts agree with assignBuckets under the same trained centroids") {
    val centroids = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 4)
    val expected = Similarity.assignBuckets(emb, "vec_id", "embedding", centroids)
      .groupBy("cid").count()
      .collect().map(r => r.getAs[Long]("cid") -> r.getAs[Long]("count")).toMap
    val got = Similarity.clusterProfile(emb, "vec_id", "embedding", 4)
      .collect().map(r => r.getAs[Long]("cid") -> r.getAs[Long]("n_members")).toMap
    assert(got == expected)
  }

  test("deterministic: two trainings produce identical profiles") {
    def run() = Similarity.clusterProfile(emb, "vec_id", "embedding", 4)
      .orderBy("cid").collect()
      .map(r => (r.getAs[Long]("cid"), r.getAs[Long]("n_members"),
        r.getAs[Double]("mean_sim"))).toSeq
    assert(run() == run())
  }
}
