package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over an embedding column
  * (`array<float>`). The vector math is pure `Column` composition
  * (`zip_with` + `aggregate`, codegen'd) — no UDF.
  *
  * Brute-force top-k is the correctness baseline (cross join against a
  * broadcast query set — fine when |queries| is small). The scale path
  * is [[ivfTopK]]: a deterministic coarse quantizer buckets all vectors
  * once (shuffle by centroid id), and each query probes only its
  * nearest `nProbe` buckets — the classic IVF trade of recall for a
  * 1/(nBuckets/nProbe) scan reduction.
  */
object Similarity {

  def toDoubleVec(c: Column): Column = transform(c, x => x.cast("double"))

  /** Sequential left-to-right dot product — a native codegen'd Catalyst
    * expression (graft.functions.DotProduct); same accumulation order
    * as DuckDB's list_dot_product for oracle parity. */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Pre-normalized double vector: cosine becomes a plain dot. */
  def unitVector(c: Column): Column = {
    val d = toDoubleVec(c)
    transform(d, x => x / sqrt(dot(d, d)))
  }

  /** Exact top-k by cosine for each query vector (brute force).
    * `queries`: (qidCol, vecCol). Deterministic ranking: cosine is
    * rounded to 6 before ordering, ties broken by candidate id. */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
                     queries: DataFrame, qidCol: String, qvecCol: String,
                     k: Int): DataFrame = {
    val cand = df.select(col(idCol).as("id"), toDoubleVec(col(vecCol)).as("v"))
    val q = queries.select(col(qidCol).as("qid"), toDoubleVec(col(qvecCol)).as("qv"))
    val scored = cand.crossJoin(broadcast(q))
      .select(col("qid"), col("id"),
        round(cosine(col("v"), col("qv")), 6).as("cosine"))
    val w = Window.partitionBy("qid")
      .orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic coarse centroids: the first `nCentroids` vectors by
    * id (reproducible "training"; swap in k-means centroids when a
    * trained quantizer is warranted). */
  def coarseCentroids(df: DataFrame, idCol: String, vecCol: String,
                      nCentroids: Int): DataFrame =
    df.orderBy(col(idCol)).limit(nCentroids)
      .select(col(idCol).as("cid"), toDoubleVec(col(vecCol)).as("cv"))

  /** Assign every vector to its nearest centroid (IVF bucketing): one
    * broadcast cross join against the tiny centroid set + per-vector
    * argmax — the bucketed table is then reusable across queries. */
  def assignBuckets(df: DataFrame, idCol: String, vecCol: String,
                    centroids: DataFrame): DataFrame = {
    val v = df.select(col(idCol).as("id"), toDoubleVec(col(vecCol)).as("v"))
    val w = Window.partitionBy("id")
      .orderBy(round(col("sim"), 6).desc, col("cid").asc)
    v.crossJoin(broadcast(centroids))
      .select(col("id"), col("v"), col("cid"), cosine(col("v"), col("cv")).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id"), col("v"), col("cid"))
  }

  /** IVF approximate top-k: probe the `nProbe` centroids nearest to
    * each query and brute-force only those buckets. With
    * nProbe == nCentroids this is exactly [[bruteForceTopK]]. */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, qidCol: String, qvecCol: String,
              k: Int, nCentroids: Int, nProbe: Int): DataFrame = {
    val centroids = coarseCentroids(df, idCol, vecCol, nCentroids)
    val bucketed = assignBuckets(df, idCol, vecCol, centroids)
    val q = queries.select(col(qidCol).as("qid"), toDoubleVec(col(qvecCol)).as("qv"))
    val wProbe = Window.partitionBy("qid")
      .orderBy(round(col("sim"), 6).desc, col("cid").asc)
    val probes = q.crossJoin(broadcast(centroids))
      .select(col("qid"), col("qv"), col("cid"), cosine(col("qv"), col("cv")).as("sim"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nProbe)
      .select(col("qid"), col("qv"), col("cid"))
    val wTop = Window.partitionBy("qid")
      .orderBy(col("cosine").desc, col("id").asc)
    bucketed.join(probes, "cid")
      .select(col("qid"), col("id"),
        round(cosine(col("v"), col("qv")), 6).as("cosine"))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
  }
}
