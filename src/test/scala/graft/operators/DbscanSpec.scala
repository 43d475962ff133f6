package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Similarity.dbscan]] — density clustering with explicit noise:
  * hand geometry (dense blob + sparse outliers), border attachment
  * determinism, and role/cluster sanity on the real corpus. */
class DbscanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  private def ray(deg: Double) = {
    val r = math.toRadians(deg)
    Seq(math.cos(r).toFloat, math.sin(r).toFloat)
  }

  test("hand geometry: dense blob = core cluster, fringe = border, far point = noise") {
    // eps 0.95 ⟺ neighbor iff angle ≤ ~18.19°. Blob 0/2/4/6°: every
    // member has ≥3 neighbors → core at minPts=4. id 20 at 22°
    // neighbors ids 4 (16°) and 3 (18°, cos .9511) only → nc 2 →
    // border. id 30 at 90° → noise.
    val d = (Seq((1L, ray(0)), (2L, ray(2)), (3L, ray(4)), (4L, ray(6)),
      (20L, ray(22)), (30L, ray(90))))
      .toDF("vec_id", "embedding")
    val got = Similarity.dbscan(d, "vec_id", "embedding",
        epsCos = 0.95, minPts = 4)
      .collect()
      .map(r => r.getAs[Long]("id") -> (r.getAs[String]("role"),
        if (r.isNullAt(r.fieldIndex("cluster"))) -1L
        else r.getAs[Long]("cluster"))).toMap
    (1L to 4L).foreach(i => assert(got(i) == (("core", 1L)), s"id $i: ${got(i)}"))
    assert(got(20L) == (("border", 1L)))
    assert(got(30L) == (("noise", -1L)))
  }

  test("border points attach to the MINIMUM core-neighbor cluster") {
    // eps 0.946 ⟺ neighbor iff angle ≤ ~18.9°. Two 4-blobs (members
    // have nc 3 → core at minPts=4); id 5 at 21.5° neighbors exactly
    // id 4 (18.5°) and id 10 (18.5°) → nc 2 → border of BOTH
    // clusters — must take the smaller label (cluster 1)
    val d = Seq(
      (1L, ray(0)), (2L, ray(1)), (3L, ray(2)), (4L, ray(3)),
      (10L, ray(40)), (11L, ray(41)), (12L, ray(42)), (13L, ray(43)),
      (5L, ray(21.5)))
      .toDF("vec_id", "embedding")
    val got = Similarity.dbscan(d, "vec_id", "embedding",
        epsCos = 0.946, minPts = 4)
      .collect()
      .map(r => r.getAs[Long]("id") -> (r.getAs[String]("role"),
        if (r.isNullAt(r.fieldIndex("cluster"))) -1L
        else r.getAs[Long]("cluster"))).toMap
    assert(got(1L)._1 == "core" && got(10L)._1 == "core")
    assert(got(10L)._2 == 10L, "second blob keeps its own min-id label")
    assert(got(5L) == (("border", 1L)), s"got ${got(5L)}")
  }

  test("real corpus: partition of roles, clusters only from cores, deterministic") {
    def run() = Similarity.dbscan(emb, "vec_id", "embedding",
        epsCos = 0.3, minPts = 5)
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("role"),
        if (r.isNullAt(r.fieldIndex("cluster"))) -1L
        else r.getAs[Long]("cluster"))).sortBy(_._1).toSeq
    val a = run()
    assert(a == run(), "deterministic")
    assert(a.map(_._1).distinct.length == emb.count())
    assert(a.forall { case (_, role, cl) =>
      (role == "noise") == (cl == -1L) })
    val roles = a.groupBy(_._2).view.mapValues(_.size).toMap
    assert(roles.keySet.subsetOf(Set("core", "border", "noise")))
    // cluster labels are core ids
    val coreIds = a.filter(_._2 == "core").map(_._1).toSet
    assert(a.filter(_._3 != -1L).forall(t => coreIds.contains(t._3)))
  }
}
