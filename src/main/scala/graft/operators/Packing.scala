package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One row of the greedy packer's input: a document's shard, id and
  * token weight. Top-level so the Dataset encoder derives cleanly. */
case class PackItem(shard: Long, id: Long, w: Long)

/** One packed document: its bin within the shard and the bin's running
  * fill after the document was placed. */
case class PackedItem(shard: Long, id: Long, w: Long, bin: Long, fill: Long)

/** Sequence assembly for LLM training corpora: fixed-window document
  * chunking and two packing disciplines that turn variable-length
  * documents into fixed-token-budget training sequences.
  *
  * Scale notes (100 TB): chunking is a pure Column pipeline — no
  * shuffle, stays inside whole-stage codegen, and the chunk explode
  * multiplies rows only by ceil(len/stride) per document. Both packers
  * operate per SHARD (a deterministic key of the document id), so the
  * only shuffle is a hash partition by shard; shard count scales with
  * the cluster and each shard packs independently — there is no global
  * sequential pass and nothing reaches the driver. The reference has no
  * counterpart (its unit of work is a training row, Main.java:137-166);
  * these are the extension operators a pretraining pipeline needs.
  */
object Packing {

  /** Fixed-size character windows with overlap (RAG/embedding-style
    * chunking): window i covers [i*stride+1, i*stride+size], clipped at
    * the end of the document. Requires stride <= size so consecutive
    * windows tile the text with overlap size-stride; every character
    * lands in at least one chunk and the last chunk always reaches the
    * final character. Pure Column composition — codegen'd, no shuffle. */
  def chunkDocs(docs: DataFrame, idCol: String, textCol: String,
                size: Int, stride: Int): DataFrame = {
    require(stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    val len = length(col(textCol))
    // last window index: smallest i with i*stride + size >= len
    val nMax = greatest(
      ceil((len - lit(size)).cast("double") / lit(stride)).cast("int"),
      lit(0))
    docs
      .select(col(idCol), col(textCol),
        explode(sequence(lit(0), nMax)).as("chunk_id"))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        col(textCol).substr(col("chunk_id") * lit(stride) + lit(1),
          lit(size)).as("chunk"))
      .withColumn("n_chunk_chars", length(col("chunk")).cast("long"))
  }

  /** Concat-then-chunk packing (zero padding waste, the GPT-style
    * discipline): within a shard, documents are laid end-to-end in id
    * order and the token stream is cut every `budget` tokens. Each
    * document maps to the sequence range it lands in: `first_seq`
    * (where its first token falls), `last_seq` (where its last token
    * falls — documents straddle cuts), and `offset` within the first
    * sequence. One window over (shard, id) — a single hash shuffle. */
  def packConcat(docs: DataFrame, idCol: String, weight: Column,
                 shard: Column, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val before = Window.partitionBy(col("shard")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = coalesce(sum(col("w")).over(before), lit(0L))
    val firstSeq = floor(cum / lit(budget)).cast("long")
    val lastSeq = floor((cum + greatest(col("w"), lit(1L)) - lit(1L)) /
      lit(budget)).cast("long")
    docs
      .select(shard.cast("long").as("shard"), col(idCol).cast("long").as("id"),
        weight.cast("long").as("w"))
      .select(col("shard"), col("id").as("doc_id"), col("w").as("n_tokens"),
        firstSeq.as("first_seq"), lastSeq.as("last_seq"),
        (cum % lit(budget)).as("offset"))
  }

  /** Greedy next-fit packing (no document straddles a sequence; the
    * remainder of a bin is padding): within a shard, documents are
    * taken in id order; when the current bin cannot fit the next
    * document the bin is closed and a new one opened. A document larger
    * than the budget gets a bin of its own. The per-shard sequential
    * dependency is real (bin boundaries depend on accumulated waste, so
    * no window expresses it) — `flatMapSortedGroups` gives each shard a
    * secondary-sorted iterator on its executor; state is two longs. */
  def packGreedy(docs: DataFrame, idCol: String, weight: Column,
                 shard: Column, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select(shard.cast("long").as("shard"), col(idCol).cast("long").as("id"),
        weight.cast("long").as("w"))
      .as[PackItem]
      .groupByKey(_.shard)
      .flatMapSortedGroups(col("id").asc) { (sh: Long, it: Iterator[PackItem]) =>
        var bin = 0L
        var fill = 0L
        it.map { r =>
          if (fill > 0 && fill + r.w > budget) { bin += 1; fill = 0L }
          fill += r.w
          PackedItem(sh, r.id, r.w, bin, fill)
        }
      }
      .toDF("shard", "doc_id", "n_tokens", "bin", "fill")
  }
}
