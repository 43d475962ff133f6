package graft.fit

import graft.SparkTestSession
import graft.meta.{AttrMeta, C45Schema}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ImportanceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("importance concentrates on the planted attributes, noise gets crumbs") {
    val s = spark
    val schema = C45Schema(
      Seq(AttrMeta("l_returnflag", isNumeric = false),
        AttrMeta("l_quantity", isNumeric = true),
        AttrMeta("l_discount", isNumeric = true)),
      "cls", Seq("N", "P"))
    val noisy = graft.functions.Hashing.hash60(
      concat_ws("|", col("l_orderkey"), col("l_linenumber"))) % 10 === 0
    val base = (col("l_returnflag") === "A") === (col("l_quantity") <= lit(25.0))
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .withColumn("cls", when(base =!= noisy, lit("P")).otherwise(lit("N")))
    val (model, imp) = C45.fitWithImportance(df, schema, C45Params(maxDepth = 4))
    val byName = imp.map { case (i, v) => schema.attrNames(i) -> v }
    // the two planted attributes carry ~all the impurity decrease
    val planted = byName.getOrElse("l_returnflag", 0.0) +
      byName.getOrElse("l_quantity", 0.0)
    val noise = byName.getOrElse("l_discount", 0.0)
    assert(planted > 0, s"planted structure must be found: $byName")
    assert(noise < planted * 0.05, s"noise attr must be marginal: $byName")
    // importance is consistent with the model actually using the attrs
    val used = model.leaves.flatMap(_.usedAttrs).toSet
    assert(imp.keySet.subsetOf(used))
  }

  test("fit and fitWithImportance return the identical model") {
    val s = spark
    import s.implicits._
    val schema = C45Schema(Seq(
      AttrMeta("a", isNumeric = false), AttrMeta("x", isNumeric = true)),
      "cls", Seq("n", "p"))
    val rows = for { a <- Seq("t", "u"); x <- 0 to 9; _ <- 1 to 3 }
      yield (a, x + 0.0, if ((a == "t") == (x <= 5)) "p" else "n")
    val df = rows.toDF("a", "x", "cls")
    val m1 = C45.fit(df, schema, C45Params(maxDepth = 3))
    val (m2, imp) = C45.fitWithImportance(df, schema, C45Params(maxDepth = 3))
    assert(m1.ruleStrings == m2.ruleStrings)
    assert(imp.nonEmpty && imp.values.forall(_ > 0))
  }

  test("importance golden: sf0.01 committed micros reproduce") {
    val got = graft.queries.C45Queries
      .qFeatureImportance(spark, "/root/testdata/sf0.01")
      .collect().map(r => s"${r.getString(0)},${r.getLong(1)}").toVector
    val src = scala.io.Source.fromResource("golden/importance_sf001.txt")
    val want = try src.getLines().filter(_.nonEmpty).toVector finally src.close()
    assert(got == want)
  }
}
