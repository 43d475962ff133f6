package graft.fit

import graft.SparkTestSession
import graft.meta.{AttrMeta, C45Schema}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CrossValSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def noisyLineitem(sf: String) = {
    val key = concat_ws("|", col("l_orderkey"), col("l_linenumber"))
    val noisy = graft.functions.Hashing.hash60(key) % 10 === 0
    val base = (col("l_returnflag") === "A") === (col("l_quantity") <= lit(25.0))
    spark.read.parquet(s"$sf/lineitem.parquet").withColumn("cls",
      when(base =!= noisy, lit("P")).otherwise(lit("N")))
  }

  private val schema = C45Schema(
    Seq(AttrMeta("l_returnflag", isNumeric = false),
      AttrMeta("l_quantity", isNumeric = true),
      AttrMeta("l_discount", isNumeric = true)),
    "cls", Seq("N", "P"))

  test("folds partition the data and held-out accuracy tracks the noise rate") {
    val df = noisyLineitem("/root/testdata/sf0.001")
    val key = concat_ws("|", col("l_orderkey"), col("l_linenumber"))
    val folds = C45CrossVal.crossValidate(df, schema,
      C45Params(maxDepth = 2), key, k = 3, salt = 7)
    assert(folds.map(_.fold) == Seq(0, 1, 2))
    // every row lands in exactly one test fold
    assert(folds.map(_.nTest).sum == df.count())
    // the planted structure is learnable from any 2/3 subset, so
    // held-out accuracy ≈ 1 - 10% noise (loose bounds: the tiny tier
    // has ~2k rows/fold)
    folds.foreach { f =>
      val acc = f.nCorrect.toDouble / f.nTest
      assert(acc > 0.8 && acc < 0.97, s"fold ${f.fold}: $acc")
    }
  }

  test("fold assignment is deterministic and salt-sensitive") {
    val df = noisyLineitem("/root/testdata/sf0.001")
    val key = concat_ws("|", col("l_orderkey"), col("l_linenumber"))
    val a = C45CrossVal.crossValidate(df, schema, C45Params(maxDepth = 1), key, 3, salt = 7)
    val b = C45CrossVal.crossValidate(df, schema, C45Params(maxDepth = 1), key, 3, salt = 7)
    assert(a == b)
    val c = C45CrossVal.crossValidate(df, schema, C45Params(maxDepth = 1), key, 3, salt = 8)
    assert(a.map(_.nTest) != c.map(_.nTest), "different salt, different folds")
  }

  test("crossval golden: sf0.01 committed counts reproduce") {
    val got = graft.queries.C45Queries.qCrossVal(spark, "/root/testdata/sf0.01")
      .collect().map(r => s"${r.getInt(0)},${r.getLong(1)},${r.getLong(2)}").toVector
    val src = scala.io.Source.fromResource("golden/crossval_sf001.txt")
    val want = try src.getLines().filter(_.nonEmpty).toVector finally src.close()
    assert(got == want)
  }
}
