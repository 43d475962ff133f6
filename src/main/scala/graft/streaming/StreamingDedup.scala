package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming exact deduplication at ingestion time: keep the FIRST
  * occurrence of each content hash across micro-batches
  * (`dropDuplicates` keeps per-key state in the state store — bound it
  * with a watermark + event-time column in production; unbounded here
  * for the batch-equivalence test). The batch dual is Dedup.exact. */
object StreamingDedup {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  def readDocStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)

  def dedupStream(docs: DataFrame): DataFrame =
    docs.withColumn("text_hash", md5(col("text")))
      .dropDuplicates("text_hash")
      .select("doc_id", "text_hash")
}
