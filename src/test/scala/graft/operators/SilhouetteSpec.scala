package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Similarity.silhouette]] — hand geometry against fixed centroids
  * (no trained quantizer in the loop, so the numbers are exact by
  * construction), assignment tie-break, and the trained-quantizer
  * composition on the real corpus. */
class SilhouetteSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def centroids2 = Seq(
    (0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))).toDF("cid", "cv")

  private def sOf(aSim: Double, bSim: Double): Double = {
    val a = 1.0 - aSim; val b = 1.0 - bSim
    val raw = if (math.max(a, b) == 0.0) 0.0 else (b - a) / math.max(a, b)
    math.floor(raw * 1e6 + 0.5) / 1e6
  }

  test("hand geometry: on-axis = 1, off-axis shrinks, ties score 0") {
    def ray(deg: Double) = {
      val r = math.toRadians(deg)
      Seq(math.cos(r), math.sin(r))
    }
    val d = Seq(
      (1L, ray(0)),     // exactly c0: a=0, b=1 -> s=1
      (2L, ray(22.5)),  // c0 side but drifting
      (3L, ray(45)),    // equidistant: 6dp-rounded tie -> cid 0, s=0
      (4L, ray(90)))    // exactly c1: s=1
      .toDF("vec_id", "embedding")
    val got = Similarity.silhouette(d, "vec_id", "embedding", centroids2)
      .collect()
      .map(r => r.getAs[Long]("cid") ->
        (r.getAs[Long]("n_members"), r.getAs[Double]("mean_sil"))).toMap
    val s1 = sOf(1.0, 0.0)
    val s2 = sOf(math.floor(math.cos(math.toRadians(22.5)) * 1e6 + 0.5) / 1e6,
      math.floor(math.cos(math.toRadians(67.5)) * 1e6 + 0.5) / 1e6)
    val s3 = 0.0 // tie: a == b after 6dp rounding
    val c0mean = math.floor(
      ((s1 * 1e6).round + (s2 * 1e6).round + (s3 * 1e6).round) / 3.0 + 0.5) / 1e6
    assert(got(0L)._1 == 3L && got(1L)._1 == 1L)
    assert(got(1L)._2 == 1.0, s"on-axis c1 member scores 1: ${got(1L)}")
    assert(math.abs(got(0L)._2 - c0mean) < 1e-9, s"got ${got(0L)._2} want $c0mean")
  }

  test("negative silhouette when a point is assigned to the wrong side") {
    // centroid table is FIXED (not trained), so planting a vector
    // nearer the other centroid is impossible via assignment — but a
    // degenerate centroid pair c0 == c1 makes every sim tie -> all s = 0
    val cs = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(1.0, 0.0))).toDF("cid", "cv")
    val d = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val got = Similarity.silhouette(d, "vec_id", "embedding", cs)
      .collect().map(r => r.getAs[Long]("cid") -> r.getAs[Double]("mean_sil")).toMap
    assert(got == Map(0L -> 0.0), s"identical centroids: every s is 0, got $got")
  }

  test("real corpus + trained quantizer: bounded values, deterministic, clusters cover") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 4, 3)
    def run() = Similarity.silhouette(emb, "vec_id", "embedding", cents)
      .collect().map(r => (r.getAs[Long]("cid"), r.getAs[Long]("n_members"),
        r.getAs[Double]("mean_sil"))).sortBy(_._1).toSeq
    val a = run()
    assert(a == run(), "deterministic")
    assert(a.map(_._2).sum == emb.count(), "every vector scored once")
    assert(a.forall(t => t._3 >= -1.0 && t._3 <= 1.0))
  }
}
