package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[Pca]] — deterministic integer power-iteration PCA: recovery of
  * planted principal directions, orthogonality, projection
  * consistency, and partition-order independence. */
class PcaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val Dim = 8
  // planted orthonormal directions in the first 4 coords
  private val D1 = Array(0.5, 0.5, 0.5, 0.5, 0.0, 0.0, 0.0, 0.0)
  private val D2 = Array(0.5, -0.5, 0.5, -0.5, 0.0, 0.0, 0.0, 0.0)

  /** x_i = a_i·D1 + b_i·D2 with var(a) >> var(b), deterministic
    * pseudo-random coefficients. */
  private def planted(n: Int): Seq[(Long, Array[Float])] =
    (0 until n).map { i =>
      val a = ((i * 37) % 101 - 50) / 10.0 // ±5
      val b = ((i * 17) % 31 - 15) / 30.0  // ±0.5
      val v = Array.tabulate(Dim)(d => (a * D1(d) + b * D2(d)).toFloat)
      (i.toLong, v)
    }

  private def cos(u: Array[Long], w: Array[Double]): Double = {
    val du = u.map(_.toDouble)
    val dot = du.zip(w).map { case (a, b) => a * b }.sum
    dot / math.sqrt(du.map(x => x * x).sum) / math.sqrt(w.map(x => x * x).sum)
  }

  private lazy val df = {
    val s = spark
    import s.implicits._
    planted(400).toDF("vec_id", "embedding")
  }

  test("recovers the planted dominant and secondary directions") {
    val m = Pca.fit(df, "embedding", nComponents = 2, iters = 8)
    assert(math.abs(cos(m.comps(0), D1)) > 0.99,
      s"pc1 vs planted D1: ${cos(m.comps(0), D1)}")
    assert(math.abs(cos(m.comps(1), D2)) > 0.95,
      s"pc2 vs planted D2: ${cos(m.comps(1), D2)}")
  }

  test("fitted components are orthogonal") {
    val m = Pca.fit(df, "embedding", nComponents = 2, iters = 8)
    val c = cos(m.comps(0), m.comps(1).map(_.toDouble))
    assert(math.abs(c) < 0.05, s"pc1·pc2 normalized: $c")
  }

  test("projection matches a driver-side replay; pc1 variance dominates") {
    val m = Pca.fit(df, "embedding", nComponents = 2, iters = 8)
    val rows = Pca.project(df, "vec_id", "embedding", m)
      .collect().map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Long]("pc1_raw"), r.getAs[Long]("pc2_raw"))).sortBy(_._1)
    val data = planted(400).toMap
    rows.take(10).foreach { case (id, p1, p2) =>
      val q = data(id).map(x =>
        math.floor(x.toDouble * Pca.QScale + 0.5).toLong)
      val c = q.zip(m.mu).map { case (a, b) => a - b }
      def dot(v: Array[Long]) =
        c.zip(v).map { case (a, b) => a * b }.sum
      assert(p1 == dot(m.comps(0)) && p2 == dot(m.comps(1)))
    }
    def variance(xs: Seq[Double]) = {
      val mu = xs.sum / xs.size
      xs.map(x => (x - mu) * (x - mu)).sum / xs.size
    }
    val v1 = variance(rows.map(_._2.toDouble).toSeq)
    val v2 = variance(rows.map(_._3.toDouble).toSeq)
    assert(v1 > v2 * 10, s"planted spread ratio should dominate: $v1 vs $v2")
  }

  test("deterministic under repartitioning") {
    def run(parts: Int) =
      Pca.fit(df.repartition(parts), "embedding", 2, 8)
        .comps.map(_.toSeq).toSeq
    assert(run(2) == run(13))
  }

  test("fit fails loudly on magnitudes beyond the long-headroom ladder") {
    // |x| > 10 overflows the covariance/matvec longs in BOTH engines —
    // garbage that would still hash-match, so the fit must refuse it
    val s = spark
    import s.implicits._
    val bad = Seq((1L, Array(10.5f, 0.0f)), (2L, Array(1.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](
      Pca.fit(bad, "embedding", nComponents = 1, iters = 2))
    assert(e.getMessage.contains("headroom"))
  }
}
