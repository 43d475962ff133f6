package graft.fit

import graft.{Fixtures, SparkTestSession}
import graft.meta.C45Schema
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** End-to-end through the reference's NATIVE input formats (SURVEY.md
  * S1/S2): a tab-separated training table + the attributes metadata
  * file grammar, then fit, then save/load through the reference's rule
  * text codec (S4). */
class TsvEndToEndSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("TSV + attributes file → schema parse → fit reproduces the DataFrame-path tree") {
    val dir = Files.createTempDirectory("graft_tsv")
    val attPath = dir.resolve("attributes.txt")
    val tsvPath = dir.resolve("train.tsv")
    Files.writeString(attPath,
      """outlook:string:sunny,overcast,rainy
        |temperature:numeric
        |humidity:numeric
        |windy:string:true,false
        |play:yes,no
        |""".stripMargin)
    Files.writeString(tsvPath, Fixtures.tennisRows.map { case (o, t, h, w, p) =>
      s"$o\t$t\t$h\t$w\t$p"
    }.mkString("\n"))

    val schema = C45Schema.parseFile(attPath.toString)
    assert(schema.attrNames == Seq("outlook", "temperature", "humidity", "windy"))
    assert(schema.attrs.map(_.isNumeric) == Seq(false, true, true, false))
    assert(schema.classLabels == Seq("yes", "no"))
    assert(schema.attrs.head.domain == Seq("sunny", "overcast", "rainy"))

    val df = Tables.loadTsv(spark, tsvPath.toString, schema)
    assert(df.count() == 14)
    val fromTsv = C45.fit(df, schema)
    val fromDf = C45.fit(Fixtures.tennis(spark), Fixtures.tennisSchema)
    assert(fromTsv.leaves.map(_.encode).sorted == fromDf.leaves.map(_.encode).sorted)
  }

  test("model save/load round-trips through the reference rule codec") {
    val model = C45.fit(Fixtures.tennis(spark), Fixtures.tennisSchema)
    val path = Files.createTempFile("graft_model", ".txt").toString
    model.saveRules(path)
    val loaded = C45Model.loadRules(path, model.schema)
    assert(loaded.leaves == model.leaves)
    assert(loaded.majority == model.majority)
    // loaded model scores identically
    val a = model.transform(Fixtures.tennis(spark)).select("prediction").collect().toSeq
    val b = loaded.transform(Fixtures.tennis(spark)).select("prediction").collect().toSeq
    assert(a == b)
  }
}
