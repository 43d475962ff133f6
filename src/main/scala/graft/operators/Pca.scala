package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal components of an embedding column in DETERMINISTIC
  * INTEGER arithmetic — the whitening/visualization/compression
  * primitive of an embedding pipeline, built so the WHOLE fit
  * (quantization → centering → covariance → power iteration →
  * projection) replays bit-exactly in a SQL oracle.
  *
  * Why integers: eigen-solvers are float-order-sensitive, so a naive
  * distributed PCA returns different last-ulp results per partition
  * layout and can never hash-match a second engine. Here every
  * accumulation is an EXACT long sum (order-free, partition-free) and
  * every normalization is ONE double expression of exact integer
  * inputs — IEEE ops on identical inputs are identical in any engine,
  * so the fitted components are reproducible bits, not approximately
  * -equal floats.
  *
  * The ladder of scales keeps every intermediate inside a long:
  *  - values quantize to MILLIS: m = floor(x·1000 + 0.5), |m| ≲ 10^4
  *  - covariance entries normalize by n: |Cn| ≤ max|c|² ≲ 4·10^8
  *  - component vectors carry VScale = 10^6 (unit = max-abs entry,
  *    NOT L2 — max-abs needs no sqrt); matvec terms then bound by
  *    64·4·10^8·10^6 ≈ 2.6·10^16 < 2^63
  *  - Gram-Schmidt runs at OrthScale = 10^4 so the cross terms
  *    û_i·Σv² − v_i·Σûv stay ≤ ~1.3·10^18 < 2^63
  *
  * Power iteration with per-round re-orthogonalization against the
  * already-fitted components (classic deflation-free Gram-Schmidt);
  * convergence to the dominant eigvec is the textbook result — the
  * fixed round count is part of the contract, like
  * [[GraphRank.pagerank]]'s. Sign is whatever the deterministic
  * start vector converges to (both engines replay it identically).
  *
  * Scale shape: the fit is two aggregation jobs — a d-sized mean and
  * a d²-bounded covariance (each partition accumulates its rows'
  * outer products into ONE flat long[d²] inside mapPartitions, so a
  * row costs d² fused multiply-adds with ZERO per-row allocation and
  * only d²·partitions longs ever move) — plus an O(d²) driver loop;
  * projection is one map-only pass with the components riding as
  * literals. d = 64 here; the driver state is 32 KB however large
  * the corpus, and the per-row cost stays arithmetic-bound at
  * realistic dims (768-dim = 590k madds/row, no allocations). */
object Pca {

  /** Quantization scale for embedding values (millis). */
  val QScale = 1000.0

  /** Component-vector scale: entries normalized to max-abs = 10^6. */
  val VScale = 1000000L

  /** Intermediate scale during Gram-Schmidt orthogonalization. */
  val OrthScale = 10000L

  /** Fitted model: all quantities exact longs. `mu` is the per-dim
    * quantized mean; `comps(k)` the k-th component at [[VScale]]. */
  case class Model(dim: Int, n: Long, mu: Array[Long],
                   comps: Array[Array[Long]])

  /** floor(x·1000 + 0.5) of the double-cast value — the shared
    * quantizer (identical expression in the SQL oracle). */
  private def quantize(vecCol: Column): Column =
    transform(vecCol, x =>
      floor(x.cast("double") * lit(QScale) + lit(0.5)).cast("long"))

  /** v normalized so max|v| = scale: floor(v_i·scale / max|v|) with
    * the multiply-then-divide done in doubles (exact integer inputs,
    * fixed op order — engine-portable). */
  private def renorm(v: Array[Long], scale: Long): Array[Long] = {
    val mx = v.map(math.abs).max
    require(mx > 0L, "degenerate (all-zero) vector in power iteration")
    v.map(w => math.floor(w.toDouble * scale.toDouble / mx.toDouble).toLong)
  }

  private def matvec(m: Array[Array[Long]], v: Array[Long]): Array[Long] =
    m.map { row =>
      var s = 0L
      var j = 0
      while (j < v.length) { s += row(j) * v(j); j += 1 }
      s
    }

  /** Fits mean + covariance (two aggregation jobs, O(d²) collect)
    * then runs `iters` power-iteration rounds per component on the
    * driver. Start vectors: all +VScale for component 0, alternating
    * ±VScale for component 1, shifted alternation for later ones —
    * deterministic and (generically) not orthogonal to the target
    * eigvecs. */
  def fit(df: DataFrame, vecCol: String, nComponents: Int = 2,
          iters: Int = 8): Model = {
    require(nComponents >= 1, "need at least one component")
    val m = df.select(quantize(col(vecCol)).as("m"))
    // per-dimension sums + row count + max|m| -> quantized mean, and
    // the scale-ladder guard in the SAME aggregation job (driver math
    // mirrors the oracle: floor(sum / n + 0.5) in doubles)
    val sums = m.select(posexplode(col("m")).as(Seq("i", "v")))
      .groupBy("i").agg(sum("v").as("s"), count(lit(1)).as("n"),
        max(abs(col("v"))).as("mx"))
      .collect().map(r => (r.getAs[Int]("i"),
        r.getAs[Long]("s"), r.getAs[Long]("n"), r.getAs[Long]("mx")))
    val dim = sums.length
    val n = sums.head._3
    // the long-headroom ladder (scaladoc) needs |m| ≲ 10^4: larger
    // magnitudes silently overflow the covariance/matvec longs in BOTH
    // engines — garbage that still hash-matches, which the oracle gate
    // cannot catch. Fail loudly instead.
    val maxAbs = sums.map(_._4).max
    require(maxAbs <= 10000L,
      s"quantized embedding magnitude $maxAbs exceeds the long-headroom " +
        "bound 10^4 (|x| <= 10 pre-quantization); rescale before Pca.fit " +
        "or results overflow undetectably")
    val mu = new Array[Long](dim)
    sums.foreach { case (i, s, nn, _) =>
      mu(i) = math.floor(s.toDouble / nn.toDouble + 0.5).toLong
    }
    // covariance: each partition folds its rows' centered outer
    // products into one flat long[d²] (mapPartitions — the one spot
    // where the imperative form beats the Column formulation: the
    // per-row transform×transform explode materialized d² structs per
    // row, ~590k allocations/row at 768-dim; here a row is d² fused
    // multiply-adds into a preallocated array). Long addition is
    // order-free, so the partial arrays reduce to EXACTLY the sums
    // the explode+groupBy produced — hash-identical model. Shuffle
    // volume is unchanged: d²·partitions longs.
    val muLit = array(mu.map(lit(_)): _*)
    import df.sparkSession.implicits._
    val dimB = dim
    val sumsFlat = m
      .select(zip_with(col("m"), muLit, (a, b) => a - b).as("c"))
      .select(col("c")).as[Seq[Long]]
      .mapPartitions { it =>
        val a = new Array[Long](dimB * dimB)
        it.foreach { cs =>
          val c = cs.toArray
          var i = 0
          while (i < dimB) {
            val ci = c(i); val off = i * dimB; var j = 0
            while (j < dimB) { a(off + j) += ci * c(j); j += 1 }
            i += 1
          }
        }
        Iterator.single(a)
      }
      .reduce { (x, y) =>
        var i = 0; while (i < x.length) { x(i) += y(i); i += 1 }; x
      }
    val cn = Array.ofDim[Long](dim, dim)
    var ii = 0
    while (ii < dim) {
      var jj = 0
      while (jj < dim) {
        cn(ii)(jj) = math.floor(
          sumsFlat(ii * dim + jj).toDouble / n.toDouble + 0.5).toLong
        jj += 1
      }
      ii += 1
    }
    // power iteration with per-round Gram-Schmidt re-orthogonalization
    val comps = Array.newBuilder[Array[Long]]
    val fitted = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
    for (k <- 0 until nComponents) {
      // deterministic starts: k=0 all +V; k>0 sign flips with period
      // k — distinct per component, generically non-orthogonal to
      // the target eigvec (the SQL oracle mirrors the same CASE)
      var v = Array.tabulate(dim)(i =>
        if (k == 0) VScale
        else if ((i / k) % 2 == 0) VScale else -VScale)
      for (_ <- 1 to iters) {
        val w = matvec(cn, v)
        if (fitted.isEmpty) v = renorm(w, VScale)
        else {
          var u = renorm(w, OrthScale)
          fitted.foreach { p =>
            var pd = 0L; var pn = 0L; var i = 0
            while (i < dim) { pd += p(i) * p(i); pn += u(i) * p(i); i += 1 }
            val o = Array.tabulate(dim)(i => u(i) * pd - p(i) * pn)
            u = renorm(o, OrthScale)
          }
          v = renorm(u, VScale)
        }
      }
      fitted += v
      comps += v
    }
    Model(dim, n, mu, comps.result())
  }

  /** Projects every row onto the fitted components: one map-only
    * pass, components as literals, scores as exact long dot products
    * (columns `pc1_raw`, `pc2_raw`, ... in quantized-millis ×
    * VScale units). */
  def project(df: DataFrame, idCol: String, vecCol: String,
              model: Model): DataFrame = {
    val muLit = array(model.mu.map(lit(_)): _*)
    val c = zip_with(quantize(col(vecCol)), muLit, (a, b) => a - b)
    val scores = model.comps.zipWithIndex.map { case (comp, k) =>
      val vLit = array(comp.map(lit(_)): _*)
      aggregate(zip_with(c, vLit, (a, b) => a * b),
        lit(0L), (acc, x) => acc + x).as(s"pc${k + 1}_raw")
    }
    df.select(col(idCol) +: scores.toSeq: _*)
  }
}
