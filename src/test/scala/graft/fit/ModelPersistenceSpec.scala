package graft.fit

import graft.SparkTestSession
import graft.meta.{AttrMeta, C45Schema}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** C45Model.save / C45Model.load — the full train → store → load →
  * serve registry loop: the reference text codec (rules.txt) plus the
  * parquet distribution sidecar must round-trip the model bit-exactly,
  * so a loaded model supports everything a live fit does
  * (transformFractional, transformProba, pruneTraining). */
class ModelPersistenceSpec extends AnyFunSuite {
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

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"c45_model_$tag").toString

  test("save → load round-trips the model bit-exactly") {
    val df = planted("/root/testdata/sf0.001")
    val model = C45.fit(df, schema, C45Params(maxDepth = 3))
    val dir = tmpDir("rt")
    model.save(spark, dir)
    val loaded = C45Model.load(spark, dir, model.schema)
    assert(loaded.leaves == model.leaves)
    assert(loaded.majority == model.majority)
    assert(loaded.leafDist == model.leafDist)
    assert(loaded.leafMass == model.leafMass)
  }

  test("loaded models serve fractional predictions and probabilities ≡ live") {
    val df = planted("/root/testdata/sf0.001")
    val model = C45.fit(df, schema, C45Params(maxDepth = 3))
    val dir = tmpDir("serve")
    model.save(spark, dir)
    val loaded = C45Model.load(spark, dir, model.schema)
    val nulled = df.withColumn("l_quantity",
      when(col("l_orderkey") % 3 === 0, lit(null).cast("double"))
        .otherwise(col("l_quantity")))
    val live = model.transformFractional(nulled, "pred")
      .groupBy("pred").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val served = loaded.transformFractional(nulled, "pred")
      .groupBy("pred").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(served == live)
    val liveP = model.transformProba(df).groupBy("prediction", "p_N", "p_P")
      .count().collect().map(_.toSeq).toSet
    val servedP = loaded.transformProba(df).groupBy("prediction", "p_N", "p_P")
      .count().collect().map(_.toSeq).toSet
    assert(servedP == liveP)
  }

  test("loaded models prune on training distributions ≡ live (store → prune)") {
    val df = planted("/root/testdata/sf0.001")
    val model = C45.fit(df, schema, C45Params(maxDepth = 4))
    val dir = tmpDir("prune")
    model.save(spark, dir)
    val loaded = C45Model.load(spark, dir, model.schema)
    val livePruned = C45Pruning.pruneTraining(model)
    val loadedPruned = C45Pruning.pruneTraining(loaded)
    assert(loadedPruned.leaves.map(_.encode) == livePruned.leaves.map(_.encode))
    assert(loadedPruned.leafDist == livePruned.leafDist)
  }

  test("save rejects distribution-less models; loadRules stays text-only") {
    val df = planted("/root/testdata/sf0.001")
    val model = C45.fit(df, schema, C45Params(maxDepth = 2))
    val dir = tmpDir("text")
    model.save(spark, dir)
    // the rules.txt inside a saved model dir is the reference codec:
    // loadRules reads it but carries no distributions
    val textOnly = C45Model.loadRules(
      java.nio.file.Paths.get(dir, "rules.txt").toString, model.schema)
    assert(textOnly.leaves == model.leaves)
    assert(textOnly.leafDist.isEmpty)
    assertThrows[IllegalArgumentException](textOnly.save(spark, tmpDir("no")))
  }

  test("maxDepth-exhausted zero-mass leaves round-trip as empty distributions") {
    val model = {
      val df = planted("/root/testdata/sf0.001")
      C45.fit(df, schema, C45Params(maxDepth = 1))
    }
    // force a synthetic zero-mass leaf (the shape a maxDepth-exhausted
    // rule produces) and check the sidecar round-trips it
    val withEmpty = model.copy(
      leaves = model.leaves :+ graft.model.Rule(
        Vector(0 -> graft.model.CatEq("Z")), Some(model.majority)),
      leafMass = model.leafMass :+ 0L,
      leafDist = model.leafDist :+ Map.empty[String, Long])
    val dir = tmpDir("empty")
    withEmpty.save(spark, dir)
    val loaded = C45Model.load(spark, dir, model.schema)
    assert(loaded.leafDist == withEmpty.leafDist)
    assert(loaded.leafMass == withEmpty.leafMass)
  }
}
