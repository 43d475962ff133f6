package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the q_curate_full stage ORDER: span-level excision must run
  * BEFORE exact dedup (and before the quality stats), because carving
  * a duplicated span out changes the text the later stages key on —
  * two docs that differ only INSIDE their duplicated spans are exact
  * duplicates only after excision. Dedup-then-excise would keep both. */
class CurationOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("excise-before-dedup collapses docs that differ only in their duplicated span") {
    val s = spark
    import s.implicits._
    // window 40 / stride 40; each doc = one 40-char duplicated span +
    // a 39-char common remainder. The remainder is SHORTER than one
    // window and past the last window start (sequence(0, len-40, 40) =
    // [0] at len 79), so it is never hashed and never excised — only
    // the spans go. Doc 3 carries both spans, making each cross-doc
    // duplicated.
    val spanA = "A" * 40
    val spanB = "B" * 40
    val rest = "kept common tail text that both docs sh" // 40? keep 39
      .take(39)
    val docs = Seq(
      (1L, spanA + rest),
      (2L, spanB + rest), // differs from doc 1 ONLY inside the span
      (3L, spanA + spanB)).toDF("doc_id", "text")
    // dedup FIRST (the wrong order): all raw texts distinct → nothing
    val preDedup = Dedup.exact(docs, "doc_id", "text")
    assert(preDedup.filter(col("n_docs") >= 2).count() == 0,
      "raw texts all distinct: dedup-before-excise finds nothing")
    // excise FIRST (q_curate_full's order): spans carved, docs 1 and 2
    // reduce to the identical remainder → exact duplicates
    val exc = Dedup.exciseDuplicateWindows(docs, "doc_id", "text", 40, 40)
      .select(col("doc_id"), col("clean_text").as("text"))
    val cleaned = exc.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cleaned(1) == rest && cleaned(2) == rest,
      s"spans excised, remainder kept: $cleaned")
    assert(cleaned(3) == "", "doc 3 was all duplicated spans")
    val postDedup = Dedup.exact(exc, "doc_id", "text")
    val collapsed = postDedup.filter(col("n_docs") >= 2).collect()
    assert(collapsed.length == 1 &&
      collapsed.head.getAs[Long]("min_doc_id") == 1L &&
      collapsed.head.getAs[Long]("n_docs") == 2L,
      "excise-first makes docs 1 and 2 exact duplicates and keeps doc 1 " +
        "as the canonical")
  }

  test("q_curate_full keeps only quality-passing canonical docs (post-excision stats)") {
    val got = graft.queries.CorpusQueries.qCurateFull(spark, "/root/testdata/sf0.001")
      .collect()
    assert(got.nonEmpty)
    // every surviving doc meets the gate's token band on its
    // POST-excision text — the stats are post-rewrite by construction
    assert(got.forall { r =>
      val n = r.getAs[Long]("n_tokens"); n >= 20L && n <= 90L
    })
  }
}
