package graft.tools

import graft.operators.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the BPE trainer's 1-job-per-merge driver loop at a
  * realistic merge count (the gate query q_bpe_train runs 10 merges —
  * right for the oracle, silent on tokenizer-scale behavior): a
  * synthetic corpus with a vocabulary large enough to sustain the
  * requested merges, then `TextAnalysis.bpeTrain` timed end to end
  * with per-phase breakdown. The question it answers: does the
  * per-round cost stay flat and vocabulary-sized as rounds pile up
  * (the word-frequency table is what every round scans — corpus size
  * only affects the ONE up-front word-count pass), or does lineage /
  * plan growth creep in?
  *
  * Usage: sbt "runMain graft.tools.BpeBench [nMerges] [vocabSize]"
  * (defaults 500, 20000). Words are deterministic letter 4-grams
  * salted by md5 — no RNG, reruns are identical.
  */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val nMerges = if (args.length > 0) args(0).toInt else 500
    val vocab = if (args.length > 1) args(1).toInt else 20000
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-bpe-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // deterministic pseudo-words: 8 letters drawn from the word id's
    // md5 — long enough that 500 merges never exhaust adjacent pairs
    // (each word contributes 7 pairs; distinct spellings keep pair
    // diversity high), Zipf-ish freq via (id % 97 + 1) so the argmax
    // has real mass differences to rank.
    val words = spark.range(vocab.toLong)
      .select(concat_ws(" ", (0 until 3).map(i =>
        regexp_replace(md5(concat(col("id").cast("string"), lit(s"_$i"))),
          "[0-9]", "").substr(1, 8)): _*).as("text"))
      .withColumn("text",
        concat_ws(" ", col("text"),
          substring(col("text"), 1, 17))) // repeated prefix: shared pairs
    val docs = words.withColumn("doc_id",
      monotonically_increasing_id()).persist()
    println(s"[bpebench] corpus: ${docs.count()} docs, vocab ~$vocab")

    val t0 = System.nanoTime()
    val table = TextAnalysis.bpeTrain(docs, "text", nMerges)
    val got = table.collect()
    val total = (System.nanoTime() - t0) / 1e9
    println(f"[bpebench] merges=${got.length} total=$total%.1fs " +
      f"per-round=${total / math.max(1, got.length)}%.3fs")
    spark.stop()
  }
}
