package graft.operators

import graft.functions.BloomBits
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact blocklist removal with a bloom prefilter — the shape for a
  * blocklist (known-bad document hashes, contaminated URLs, DMCA
  * fingerprints) that is too large to broadcast as a hash relation but
  * whose bloom BITS fit comfortably on every executor: a 100M-entry
  * blocklist is gigabytes as a broadcast map, ~170 MB as bloom bits at
  * 3% fpp.
  *
  * Semantics are EXACTLY `corpus LEFT ANTI JOIN blocklist` (NOT
  * EXISTS): the bloom only routes. Rows the bloom clears — at 100 TB,
  * almost all of them — are emitted straight from the scan, no shuffle;
  * only bloom-positive rows (true hits + the fpp sliver) reach the
  * anti-join, shrinking its left side from |corpus| to roughly
  * |hits| + fpp·|corpus| regardless of corpus size. False positives are
  * then eliminated exactly by the join, so the result is independent of
  * the filter's sizing; `expectedItems` tunes cost only. Null corpus
  * keys match nothing and pass. The corpus is scanned twice (once per
  * branch) — at scale the scan is the cheap leg, the avoided shuffle of
  * the ~whole corpus is the expensive one. */
object Blocklist {

  def filterOut(corpus: DataFrame, blocklist: DataFrame,
                corpusKey: String, blockKey: String,
                expectedItems: Long = 1L << 20): DataFrame = {
    val bitsRow = blocklist
      .agg(BloomBits.bloomAgg(col(blockKey), expectedItems).as("bf")).head()
    if (bitsRow.isNullAt(0)) return corpus // empty blocklist blocks nothing
    val bits = bitsRow.getAs[Array[Byte]](0)
    val might = coalesce(BloomBits.mightContain(bits, col(corpusKey)), lit(false))
    val pass = corpus.filter(!might)
    val candidates = corpus.filter(might)
      .join(blocklist.select(col(blockKey).as(corpusKey)).distinct(),
        Seq(corpusKey), "left_anti")
    pass.unionByName(candidates)
  }
}
