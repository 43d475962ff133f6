package graft.fit

import graft.functions.Hashing
import graft.meta.C45Schema
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-fold cross-validation for the C4.5 fit — the evaluation surface
  * the reference lacks entirely (SURVEY.md §0: no train/test split, no
  * inference phase; the fitted rules are its only deliverable).
  *
  * Fold assignment is a pure Column over the portable salted-md5 hash
  * of a caller-chosen row key ([[Hashing.hash60]] — the same
  * cross-engine hash every sketch here uses): deterministic under any
  * partitioning, reproducible across engines, and leakage-safe the
  * same way the split-assignment operator is — key by a GROUP (e.g. a
  * near-dup cluster id) and the whole group lands in one fold.
  *
  * Scale shape: ONE pass stamps the fold column (no shuffle); each of
  * the k rounds is a filtered fit (the fit's own O(model) histogram
  * loop) plus one map-side evaluation aggregation over the held-out
  * fold — `transform` is a flat CASE WHEN, so scoring never shuffles
  * at all. Total cost ≈ k × fit + k scans; nothing new materializes.
  * Counts are exact longs, so the result is bit-stable at every tier. */
object C45CrossVal {

  case class FoldResult(fold: Int, nTest: Long, nCorrect: Long)

  /** Cross-validate `params` on `df`: for each fold f, fit on the
    * other k-1 folds, score fold f, count exact hits. */
  def crossValidate(df: DataFrame, schema: C45Schema, params: C45Params,
                    foldKey: Column, k: Int, salt: Int = 0): Seq[FoldResult] = {
    require(k >= 2, s"need at least 2 folds, got $k")
    val fold = (Hashing.hash60(foldKey, salt) % k).cast("int")
    // ONE materialization serves all k fits and all k eval passes: the
    // per-fit filters read through this cache, and the pre-persisted
    // input makes C45.fit skip its own per-fit persist
    val stamped = df
      .withColumn("__fold", fold) // stamp BEFORE projecting the key away
      .select(("__fold" +: schema.attrNames :+ schema.classCol)
        .map(org.apache.spark.sql.functions.col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try (0 until k).map { f =>
      val model = C45.fit(stamped.filter(col("__fold") =!= f), schema, params)
      val scored = model.transform(stamped.filter(col("__fold") === f), "__pred")
      val row = scored.agg(
        count(lit(1)).as("n"),
        count(when(col("__pred") ===
          col(schema.classCol).cast("string"), 1)).as("c")).head()
      FoldResult(f, row.getLong(0), row.getLong(1))
    } finally stamped.unpersist()
  }

  /** SQL fragment mirroring the fold stamp for oracles/goldens. */
  def foldSql(keyExpr: String, k: Int, salt: Int = 0): String =
    s"${Hashing.hash60Sql(keyExpr, salt)} % $k"
}
