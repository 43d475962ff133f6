package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class SinksSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("partitioned parquet: filters on the partition column prune the scan") {
    val out = Files.createTempDirectory("graft_part").toString + "/li"
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    Sinks.writePartitioned(li, out, Seq("l_returnflag"))
    val back = spark.read.parquet(out).filter(col("l_returnflag") === "A")
    // correctness: partition round-trip preserves the rows
    assert(back.count() ==
      li.filter(col("l_returnflag") === "A").count())
    // pruning: the physical scan must carry a PartitionFilters entry on
    // l_returnflag and read only the matching directory
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("l_returnflag"), plan.take(500))
    val prunedFiles = back.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(prunedFiles.nonEmpty &&
      prunedFiles.forall(_.contains("l_returnflag=A")))
  }

  test("csv (reference TSV shape) and json round-trip") {
    val out = Files.createTempDirectory("graft_sink").toString
    val df = spark.read.parquet(s"$sf/nation.parquet")
    Sinks.writeCsv(df, s"$out/csv")
    Sinks.writeJson(df, s"$out/json")
    val csvBack = spark.read.option("sep", "\t").schema(df.schema).csv(s"$out/csv")
    val jsonBack = spark.read.schema(df.schema).json(s"$out/json")
    assert(csvBack.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
    assert(jsonBack.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
  }

  test("orc round-trip preserves every typed value bit-exactly") {
    val out = Files.createTempDirectory("graft_orc").toString + "/li"
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    Sinks.writeOrc(li, out)
    val back = spark.read.orc(out)
    assert(back.schema == li.schema)
    val key = li.columns.toSeq
    assert(back.orderBy(key.map(col): _*).collect().toSeq ==
      li.orderBy(key.map(col): _*).collect().toSeq)
  }

  test("FitMain CLI: reference UX end-to-end (TSV + attributes → printed rules)") {
    val dir = Files.createTempDirectory("graft_cli")
    Files.writeString(dir.resolve("attributes.txt"),
      "outlook:string:sunny,overcast,rainy\ntemperature:numeric\n" +
        "humidity:numeric\nwindy:string:true,false\nplay:yes,no\n")
    Files.writeString(dir.resolve("train.tsv"),
      graft.Fixtures.tennisRows.map { case (o, t, h, w, p) =>
        s"$o\t$t\t$h\t$w\t$p"
      }.mkString("\n"))
    val modelOut = dir.resolve("model.txt").toString
    graft.tools.FitMain.main(Array(
      dir.resolve("train.tsv").toString,
      dir.resolve("attributes.txt").toString, modelOut))
    val loaded = graft.fit.C45Model.loadRules(modelOut, graft.Fixtures.tennisSchema)
    assert(loaded.leaves.nonEmpty)
    assert(loaded.leaves.forall(_.conditions.head._1 == 0)) // root = outlook
  }
}
