package graft.fit

import graft.{Fixtures, SparkTestSession}
import graft.meta.C45Schema
import graft.model.{CatEq, NumLE, NumGT}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class C45Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  lazy val model: C45Model =
    C45.fit(Fixtures.tennis(spark), Fixtures.tennisSchema)

  test("golden play-tennis: root splits on outlook, overcast is a pure leaf") {
    // every leaf path must start with an outlook condition
    assert(model.leaves.nonEmpty)
    model.leaves.foreach { r => assert(r.conditions.head._1 == 0) }
    val overcast = model.leaves.filter(_.conditions.exists {
      case (0, CatEq("overcast")) => true; case _ => false
    })
    assert(overcast.map(_.label.get).distinct == Vector("yes"))
    assert(overcast.forall(_.depth == 1)) // closed immediately: pure
  }

  test("golden play-tennis: sunny branch splits humidity at 70, rainy on windy") {
    val sunnyLeaves = model.leaves.filter(_.conditions.contains(0 -> CatEq("sunny")))
    assert(sunnyLeaves.toSet == Set(
      graft.model.Rule(Vector(0 -> CatEq("sunny"), 2 -> NumLE(70.0)), Some("yes")),
      graft.model.Rule(Vector(0 -> CatEq("sunny"), 2 -> NumGT(70.0)), Some("no"))))
    val rainyLeaves = model.leaves.filter(_.conditions.contains(0 -> CatEq("rainy")))
    assert(rainyLeaves.toSet == Set(
      graft.model.Rule(Vector(0 -> CatEq("rainy"), 3 -> CatEq("true")), Some("no")),
      graft.model.Rule(Vector(0 -> CatEq("rainy"), 3 -> CatEq("false")), Some("yes"))))
  }

  test("transform reproduces every training label (fully-grown tree)") {
    val scored = model.transform(Fixtures.tennis(spark))
    assert(scored.filter(col("prediction") =!= col("play")).count() == 0)
  }

  test("every training row reaches exactly one leaf (quirk #4 must not occur)") {
    val names = Fixtures.tennisSchema.attrNames
    val df = Fixtures.tennis(spark)
    val nMatches = model.leaves
      .map(r => when(r.toPredicate(names), 1).otherwise(0))
      .reduce(_ + _)
    val bad = df.withColumn("m", nMatches).filter(col("m") =!= 1).count()
    assert(bad == 0)
  }

  test("leaf labels are majority class, not last-seen (quirk #2)") {
    val s = spark
    import s.implicits._
    // x=a: 3 yes / 1 no, x=b: pure no; attribute y is constant
    val df = Seq(
      ("a", "k", "yes"), ("a", "k", "yes"), ("a", "k", "yes"), ("a", "k", "no"),
      ("b", "k", "no"), ("b", "k", "no")).toDF("x", "y", "cls")
    val schema = C45Schema.fromDataFrame(df, "cls")
    val m = C45.fit(df, schema)
    val aLeaf = m.leaves.find(_.conditions.contains(0 -> CatEq("a")))
    assert(aLeaf.exists(_.label.contains("yes"))) // majority of 3/1
  }

  test("pure input yields a single root leaf") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", "yes"), ("b", "yes"), ("c", "yes")).toDF("x", "cls")
    val m = C45.fit(df, C45Schema.fromDataFrame(df, "cls"))
    assert(m.leaves.map(_.label.get) == Vector("yes"))
    assert(m.leaves.head.conditions.isEmpty)
  }

  test("no-signal input closes as majority leaf instead of dropping rows (quirk #4)") {
    val s = spark
    import s.implicits._
    // class independent of x → zero gain everywhere
    val df = Seq(("a", "yes"), ("a", "no"), ("b", "yes"), ("b", "no"),
      ("a", "yes"), ("b", "yes")).toDF("x", "cls")
    val m = C45.fit(df, C45Schema.fromDataFrame(df, "cls"))
    assert(m.leaves.map(_.label.get) == Vector("yes"))
  }

  test("maxDepth bounds the tree and closes survivors as majority leaves") {
    val m = C45.fit(Fixtures.tennis(spark), Fixtures.tennisSchema,
      C45Params(maxDepth = 1))
    assert(m.leaves.forall(_.depth <= 1))
    assert(m.leaves.forall(_.label.isDefined))
  }

  test("unseen categorical value falls back to global majority in transform") {
    val s = spark
    import s.implicits._
    val unseen = Seq(("foggy", 70.0, 70.0, "false"))
      .toDF("outlook", "temperature", "humidity", "windy")
    val got = model.transform(unseen).select("prediction").collect()(0).getString(0)
    assert(got == "yes") // 9 yes / 5 no overall
  }
}
