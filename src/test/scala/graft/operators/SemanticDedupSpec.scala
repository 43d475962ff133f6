package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Similarity.semanticDedup]] — SemDeDup-style cluster-scoped
  * embedding dedup: planted near-dup recovery, equivalence to the
  * brute-force within-cluster rule, and threshold monotonicity. */
class SemanticDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("planted near-dup pair: the larger id drops, singletons survive") {
    // two tight near-dups (cos ~ 1) far from two orthogonal singletons
    val rows = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.999f, 0.04f, 0.0f)), // near-dup of 1 -> dropped
      (10L, Seq(0.0f, 1.0f, 0.0f)),
      (11L, Seq(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity
      .semanticDedup(rows, "vec_id", "embedding", nCentroids = 2,
        simThreshold = 0.95)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("keep"))
      .toMap
    assert(got.keySet == Set(1L, 2L, 10L, 11L))
    assert(got(1L), "smallest id of the near-dup pair must survive")
    assert(!got(2L), "larger id of the near-dup pair must drop")
    assert(got(10L) && got(11L), "singletons must survive")
  }

  test("matches the brute-force within-cluster rule under the same trained centroids") {
    val thr = 0.3
    val centroids = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 4)
    val assigned = Similarity
      .assignBuckets(emb, "vec_id", "embedding", centroids)
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("cid"),
        r.getAs[Seq[Double]]("v").toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      math.rint(d / (math.sqrt(na) * math.sqrt(nb)) * 1e6) / 1e6
    }
    val expectedDropped = (for {
      (bId, bCid, bV) <- assigned
      if assigned.exists { case (aId, aCid, aV) =>
        aCid == bCid && aId < bId && cos(aV, bV) >= thr }
    } yield bId).toSet
    val got = Similarity
      .semanticDedup(emb, "vec_id", "embedding", nCentroids = 4,
        simThreshold = thr)
      .collect()
    assert(got.length == assigned.length, "every vector is annotated")
    val gotDropped =
      got.filter(!_.getAs[Boolean]("keep")).map(_.getAs[Long]("id")).toSet
    assert(gotDropped == expectedDropped)
    assert(gotDropped.nonEmpty,
      "corpus slice should contain at least one within-cluster near-dup at thr=0.3")
  }

  test("candidate join is key-equality on cid — never a cartesian corpus join") {
    val plan = Similarity
      .semanticDedup(emb, "vec_id", "embedding", nCentroids = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
    // AQE may plan the cid equi-join as SMJ, shuffled-hash or (small
    // side) broadcast-hash — all key-equality; what must NEVER appear
    // is the corpus self-join as a cartesian/nested-loop product
    val cidJoin = Seq("SortMergeJoin [cid", "ShuffledHashJoin [cid",
      "BroadcastHashJoin [cid").exists(plan.contains)
    assert(cidJoin,
      s"within-cluster candidates must equi-join on cid:\n$plan")
  }

  test("degenerate duplicate-mass corpus: copies collapse before the join, output exact") {
    // 400 identical vectors + 2 distinct: the pair join must see 3
    // distinct vectors per cluster at most, and every non-min copy
    // drops (cos = 1 >= any threshold <= 1)
    val rows = ((1 to 400).map(i => (i.toLong, Seq(1.0f, 0.0f))) ++
      Seq((900L, Seq(0.0f, 1.0f)), (901L, Seq(-1.0f, 0.1f))))
      .toDF("vec_id", "embedding")
    val got = Similarity.semanticDedup(rows, "vec_id", "embedding",
        nCentroids = 2, simThreshold = 0.9)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("keep"))
      .toMap
    assert(got.size == 402)
    assert(got(1L), "the min-id copy survives")
    assert((2 to 400).forall(i => !got(i.toLong)), "every other copy drops")
    assert(got(900L) && got(901L), "distinct vectors survive at thr 0.9")
  }

  test("raising the threshold only un-drops (monotone in simThreshold)") {
    def droppedAt(thr: Double): Set[Long] = Similarity
      .semanticDedup(emb, "vec_id", "embedding", nCentroids = 4,
        simThreshold = thr)
      .filter(!col("keep")).select("id").as[Long].collect().toSet
    val lo = droppedAt(0.2)
    val hi = droppedAt(0.4)
    assert(hi.subsetOf(lo),
      "the clustering is threshold-independent, so a higher threshold's pair set shrinks")
  }
}
