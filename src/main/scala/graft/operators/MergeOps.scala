package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot maintenance for a keyed corpus: apply a CDC-style changeset
  * (upserts + deletes) to a base table — the operation a dataset
  * version bump runs between crawls. The reference engine is
  * fit-only (no mutation surface exists in Main.java); this is part of
  * the extension surface a managed 100 TB corpus needs.
  *
  * Scale notes: one full-outer equi-join on the key — sort-merge at
  * corpus scale, broadcast when the changeset is small (AQE decides);
  * with the base and the changeset bucketed by key the join is
  * shuffle-free. No window, no driver state, output is exactly
  * |base ∪ inserts| − |deletes| rows.
  */
object MergeOps {

  /** Merge `changes` into `base` on `key`. `changes` carries the same
    * payload columns as `base` plus `opCol` ∈ {"U","D"}: U rows upsert
    * (update when the key exists, insert when it doesn't; null payload
    * cells keep the base value), D rows delete the key. At most one
    * change row per key. */
  def merge(base: DataFrame, changes: DataFrame, key: String,
            opCol: String): DataFrame = {
    val payload = base.columns.filterNot(_ == key).toSeq
    require(payload.forall(changes.columns.contains),
      s"changes must carry the base payload columns $payload")
    val b = base.select(col(key) +: payload.map(c => col(c).as(s"__b_$c")): _*)
    b.join(changes, Seq(key), "full_outer")
      .filter(col(opCol).isNull || col(opCol) =!= "D")
      .select(col(key) +: payload.map(c =>
        coalesce(col(c), col(s"__b_$c")).as(c)): _*)
  }
}
