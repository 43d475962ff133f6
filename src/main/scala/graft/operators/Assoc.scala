package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Association mining over (basket, item) memberships — frequent
  * co-occurring pairs with exact integer LIFT. One operator, two
  * front-ends: market-basket pairs over order line items and
  * presence-based token co-occurrence over documents (lift is the
  * monotone exp of PMI, so ranking by `lift_micros` IS ranking by
  * pointwise mutual information without either engine evaluating a
  * float log).
  *
  * Algorithm: the size-2 A-priori pass (Agrawal & Srikant, VLDB 1994)
  * in relational form. An infrequent ITEM cannot appear in a frequent
  * PAIR, so the item-support table — vocabulary-sized, partial-agg'd
  * — prunes memberships BEFORE the within-basket self-join. That
  * prune is the scale story: the pair explode is quadratic in basket
  * width, and at corpus scale the width that matters is the width
  * AFTER dropping the long tail of rare items. The join keys on the
  * basket id (equi-join, AQE-broadcastable support side), pair counts
  * partial-aggregate, and the output is bounded by the pair-support
  * floor — nothing row-scaled survives to the driver.
  *
  * Determinism: supports are exact longs and
  * `lift_micros = n_ab · B · 10^6 div (n_a · n_b)` is one BIGINT
  * division both engines compute identically (headroom: the
  * numerator is ≤ B²·10^6, inside long range for B ≤ 3·10^6 baskets
  * per run — shard runs beyond that, or rescale the unit). */
object Assoc {

  /** Frequent pairs with lift over a membership table.
    *
    * @param memberships   distinct (basket, item) rows — callers
    *                      dedup/explode upstream so this operator has
    *                      ONE contract (presence, not multiplicity)
    * @param minItemSupport A-priori floor on single-item support
    * @param minPairSupport floor on pair support (the output bound)
    * @return (item1, item2, n_ab, n_a, n_b, lift_micros),
    *         item1 < item2
    */
  def pairLift(memberships: DataFrame, basketCol: String, itemCol: String,
               minItemSupport: Long, minPairSupport: Long,
               scope: CacheScope = CacheScope.unmanaged()): DataFrame = {
    // a pair with support >= minPairSupport implies both items have at
    // least that support, so the prune floor is the max of the two
    val floorSup = math.max(minItemSupport, minPairSupport)
    val m = scope.persist(
      memberships.select(col(basketCol).as("b"), col(itemCol).as("it")))
    val nBaskets = m.select("b").distinct().count()
    val sup = scope.persist(
      m.groupBy("it").agg(count(lit(1)).as("n_it"))
        .where(col("n_it") >= floorSup))
    val kept = m.join(sup, "it") // A-priori prune before the explode
    val pairs = kept.select(col("b"), col("it").as("i1"), col("n_it").as("n_a"))
      .join(kept.select(col("b"), col("it").as("i2"), col("n_it").as("n_b")),
        "b")
      .where(col("i1") < col("i2"))
      .groupBy("i1", "i2", "n_a", "n_b")
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minPairSupport)
    pairs.select(col("i1").as("item1"), col("i2").as("item2"),
      col("n_ab"), col("n_a"), col("n_b"),
      expr(s"(n_ab * ${nBaskets}L * 1000000L) div (n_a * n_b)")
        .as("lift_micros"))
  }
}
