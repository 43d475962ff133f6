package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
object NgramCompare {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").filter(col("doc_id") < 1000)
    def naive() = {
      val sh = docs.select(col("doc_id").as("id"), Dedup.shingles(col("text"), 1).as("sh"))
      val sizes = sh.select(col("id"), size(col("sh")).as("sz"))
      val ex = sh.select(col("id"), explode(col("sh")).as("s"))
      ex.as("a").join(ex.as("b"), col("a.s") === col("b.s"))
        .filter(col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("i"), col("b.id").as("j"))
        .agg(count(lit(1)).as("common"))
        .join(sizes.withColumnRenamed("id", "i").withColumnRenamed("sz", "sz_i"), "i")
        .join(sizes.withColumnRenamed("id", "j").withColumnRenamed("sz", "sz_j"), "j")
        .withColumn("jaccard", col("common").cast("double") / (col("sz_i") + col("sz_j") - col("common")))
        .filter(col("jaccard") >= 0.8)
    }
    def prefix() = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 1, 0.8)
    naive().count(); prefix().count()  // warmup
    (1 to 2).foreach { i =>
      var t0 = System.nanoTime(); val nN = naive().count()
      println(f"[cmp] naive  run $i: ${(System.nanoTime()-t0)/1e9}%.2fs ($nN rows)")
      t0 = System.nanoTime(); val nP = prefix().count()
      println(f"[cmp] prefix run $i: ${(System.nanoTime()-t0)/1e9}%.2fs ($nP rows)")
    }
    spark.stop()
  }
}
