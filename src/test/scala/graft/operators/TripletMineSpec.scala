package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Similarity.tripletMine]] — hardest-positive / hardest-negative
  * mining: hand-built geometry, brute-force equality on the real
  * corpus, null sides, and the no-window aggregation plan shape. */
class TripletMineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("hand-built geometry: farthest positive, closest impostor, violation sign") {
    // label A: 1 at 0°, 2 at ~10°, 3 at ~60° (hardest positive for 1).
    // label B: 10 at ~45° (closest impostor for 1), 11 at ~90°.
    def ray(deg: Double) = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    val d = Seq(
      (1L, ray(0), "A"), (2L, ray(10), "A"), (3L, ray(60), "A"),
      (10L, ray(45), "B"), (11L, ray(90), "B")
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.tripletMine(d, "vec_id", "embedding", "label",
      d.filter(col("vec_id") === 1), "vec_id", "embedding", "label")
      .collect().head
    assert(got.getAs[Long]("pos_id") == 3L, "hardest positive = farthest same-label")
    assert(got.getAs[Long]("neg_id") == 10L, "hardest negative = closest impostor")
    // cos(45°) > cos(60°): the impostor is closer than the far positive
    assert(got.getAs[Double]("violation") > 0.0, "triplet must be active")
  }

  test("anchor with a unique label has no positive side (NULL), negatives still mined") {
    val d = Seq(
      (1L, Seq(1.0f, 0.0f), "solo"),
      (2L, Seq(0.0f, 1.0f), "B"), (3L, Seq(0.7f, 0.7f), "B")
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.tripletMine(d, "vec_id", "embedding", "label",
      d.filter(col("vec_id") === 1), "vec_id", "embedding", "label")
      .collect().head
    assert(got.isNullAt(got.fieldIndex("pos_id")))
    assert(got.getAs[Long]("neg_id") == 3L) // cos 0.7/0.7 ray beats orthogonal
  }

  test("matches per-anchor brute force on the real corpus") {
    val anchors = emb.filter(col("vec_id") < 10)
    val got = Similarity.tripletMine(emb, "vec_id", "embedding", "label",
      anchors, "vec_id", "embedding", "label")
      .collect().map(r => r.getAs[Long]("qid") ->
        (r.getAs[Long]("pos_id"), r.getAs[Double]("pos_cos"),
          r.getAs[Long]("neg_id"), r.getAs[Double]("neg_cos"))).toMap
    val all = emb.select(col("vec_id"), col("label"),
        Similarity.toDoubleVec(col("embedding")).as("v"))
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getAs[Seq[Double]]("v").toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.indices.map(i => a(i) * b(i)).sum
      math.rint(d / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum)) * 1e6) / 1e6
    }
    all.filter(_._1 < 10).foreach { case (qid, qlbl, qv) =>
      val others = all.filter(_._1 != qid)
      val pos = others.filter(_._2 == qlbl)
        .map { case (id, _, v) => (cos(v, qv), id) }
        .minOption(Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))
      val neg = others.filter(_._2 != qlbl)
        .map { case (id, _, v) => (-cos(v, qv), id) }
        .minOption(Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))
      val (gp, gpc, gn, gnc) = got(qid)
      assert(pos.exists(p => p._2 == gp && p._1 == gpc), s"pos mismatch qid=$qid")
      assert(neg.exists(n => n._2 == gn && -n._1 == gnc), s"neg mismatch qid=$qid")
    }
  }

  test("plan is one aggregation over a broadcast join — no Window, no SortMergeJoin") {
    val plan = Similarity.tripletMine(emb, "vec_id", "embedding", "label",
      emb.filter(col("vec_id") < 10), "vec_id", "embedding", "label")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"per-candidate window would skew:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"anchor side must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no corpus shuffle expected:\n$plan")
  }
}
