package graft.sources

import graft.meta.C45Schema
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source surface (SURVEY.md S1-S3): columnar parquet for the testdata
  * tables, plus the reference's native row format — tab-separated text
  * with the class label positionally last (consumed by TextInputFormat
  * in the reference, Main.java:200 / MyMapper.java:28-31) — read through
  * Spark's csv source with an explicit schema (schema-on-read, never
  * inference, matching the reference's external attributes file). */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one testdata table: `dir/name.parquet`. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Reference-native TSV training table under an explicit C45 schema. */
  def loadTsv(spark: SparkSession, path: String, schema: C45Schema): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("header", "false")
      .schema(schema.toStructType)
      .csv(path)
}
