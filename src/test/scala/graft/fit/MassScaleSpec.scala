package graft.fit

import graft.SparkTestSession
import graft.meta.{AttrMeta, C45Schema}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the C45Model scaladoc's mass-scale contract: `leafMass` /
  * `leafDist` are exact integer micros in BOTH missing modes — a
  * drop-mode fit records row counts × 10⁶ and a fractional fit's
  * weights are exactly 10⁶ wherever no null actually fans out — so the
  * scale is mode-INdependent and absolute-mass consumers never see a
  * 10⁶× step between a fractional fused fold fit and a direct
  * `C45.fit` on the same subset (the round-16 advice worried the fused
  * path's global fractional switch changed the scale for null-free
  * fold complements; it does not). */
class MassScaleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val schema = C45Schema(
    Seq(AttrMeta("l_returnflag", isNumeric = false),
      AttrMeta("l_quantity", isNumeric = true),
      AttrMeta("l_discount", isNumeric = true)),
    "cls", Seq("N", "P"))

  private def planted(sf: String) = {
    val key = concat_ws("|", col("l_orderkey"), col("l_linenumber"))
    val noisy = graft.functions.Hashing.hash60(key) % 10 === 0
    val base = (col("l_returnflag") === "A") === (col("l_quantity") <= lit(25.0))
    spark.read.parquet(s"$sf/lineitem.parquet").withColumn("cls",
      when(base =!= noisy, lit("P")).otherwise(lit("N")))
  }

  test("drop-mode masses are row counts × 1e6 and sum to the corpus") {
    val df = planted("/root/testdata/sf0.001")
    val model = C45.fit(df, schema, C45Params(maxDepth = 2, missingMode = "drop"))
    assert(model.leafMass.forall(_ % 1000000L == 0L))
    assert(model.leafMass == model.leafDist.map(_.values.sum))
    assert(model.leafMass.sum == df.count() * 1000000L,
      "leaves partition the (null-free) corpus at 1e6 micros per row")
  }

  test("fractional mode on a null-free corpus records the SAME masses as drop mode") {
    val df = planted("/root/testdata/sf0.001")
    val drop = C45.fit(df, schema, C45Params(maxDepth = 3, missingMode = "drop"))
    val frac = C45.fit(df, schema, C45Params(maxDepth = 3))
    assert(frac.leaves == drop.leaves)
    assert(frac.leafMass == drop.leafMass, "no nulls → every weight exactly 1e6")
    assert(frac.leafDist == drop.leafDist)
  }

  test("fused fold fit: a fold whose training complement is null-free gets " +
      "the same masses as a direct C45.fit on that subset") {
    // nulls planted ONLY in fold-2 rows: model 2 (training on folds
    // 0+1) has a null-free complement, yet the fused fit runs ALL k
    // fits weighted because ANY fold has nulls — the advice scenario.
    // Masses must still match a direct fit bit-for-bit (micros either
    // way; fold-2's absence of fan-out keeps every weight at 1e6).
    val key = concat_ws("|", col("l_orderkey"), col("l_linenumber"))
    val k = 3
    val fold = (graft.functions.Hashing.hash60(key, 7) % k).cast("int")
    val df = planted("/root/testdata/sf0.001")
      .withColumn("__fold", fold)
      .withColumn("l_discount",
        when(col("__fold") === 2 &&
            graft.functions.Hashing.hash60(key, 3) % 4 === 0, lit(null))
          .otherwise(col("l_discount")))
    val stamped = df
      .select(("__fold" +: schema.attrNames :+ "cls").map(col): _*)
      .persist()
    try {
      assert(stamped.filter(col("__fold") =!= 2 &&
        col("l_discount").isNull).count() == 0, "complement of fold 2 is null-free")
      assert(stamped.filter(col("l_discount").isNull).count() > 0,
        "the corpus as a whole has nulls (engages the fused weighted path)")
      val params = C45Params(maxDepth = 3)
      val fused = C45.fitFolds(stamped, "__fold", k, schema, params,
        fractional = true)
      val direct = C45.fit(stamped.filter(col("__fold") =!= 2), schema, params)
      assert(fused(2).leaves == direct.leaves)
      assert(fused(2).leafMass == direct.leafMass,
        "same micro scale whether fit fused-weighted or directly")
      assert(fused(2).leafDist == direct.leafDist)
    } finally stamped.unpersist()
  }
}
